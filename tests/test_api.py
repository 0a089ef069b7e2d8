"""OptiX-shaped API layer: context/module/pipeline/SBT/accel/callables."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu import api
from optix_raytracer_tpu.api.context import StageTimers
from optix_raytracer_tpu.scene.builtins import (CORNELL_MATERIALS,
                                                CORNELL_LIGHT_CORNER,
                                                CORNELL_LIGHT_V1,
                                                CORNELL_LIGHT_V2,
                                                CORNELL_LIGHT_EMISSION,
                                                _CORNELL_QUADS,
                                                cornell_camera,
                                                quads_to_triangles)
from optix_raytracer_tpu.shade.lights import ParallelogramLight


class TestDeviceContext:
    def test_log_callback_levels(self, tmp_path):
        msgs = []
        ctx = api.DeviceContext(
            log_callback=lambda lvl, tag, msg: msgs.append((lvl, tag, msg)),
            log_level=api.LogLevel.PRINT,
            cache_location=str(tmp_path / "cache"))
        ctx.log(api.LogLevel.ERROR, "TEST", "boom")
        assert any(t == "TEST" for _, t, _ in msgs)
        # level filtering
        ctx.set_log_callback(lambda *a: msgs.append(a), api.LogLevel.FATAL)
        before = len(msgs)
        ctx.log(api.LogLevel.WARNING, "X", "filtered")
        assert len(msgs) == before

    def test_properties_and_cache(self, tmp_path):
        ctx = api.DeviceContext(cache_location=str(tmp_path / "c2"))
        assert ctx.get_property("num_devices") >= 1
        assert ctx.get_cache_location().endswith("c2")
        ctx.set_cache_location(str(tmp_path / "c3"))
        assert ctx.get_cache_location().endswith("c3")


class TestModule:
    def test_entry_points_and_bound_values(self):
        def shade(x, scale=1.0):
            return x * scale

        mod = api.Module({"__closesthit__shade": shade},
                         bound_values={"scale": 3.0})
        fn = mod.get("__closesthit__shade")
        assert float(fn(jnp.float32(2.0))) == 6.0
        with pytest.raises(KeyError):
            mod.get("__miss__nope")

    def test_compile_with_tasks(self):
        jobs = [(lambda x: x + i, (jnp.zeros((4,)),)) for i in range(3)]
        execs = api.compile_with_tasks(jobs, max_workers=2)
        assert len(execs) == 3
        np.testing.assert_allclose(execs[2](jnp.ones((4,))), 3.0)

    def test_aot_compile_entry(self):
        mod = api.Module({"__raygen__f": lambda x: x * 2})
        compiled = mod.compile_entry("__raygen__f", jnp.zeros((8,)))
        np.testing.assert_allclose(compiled(jnp.ones((8,))), 2.0)


class TestBuiltinISModule:
    def test_sphere_intersection(self):
        from optix_raytracer_tpu.core.rays import Rays
        mod = api.builtin_is_module("sphere")
        prims = mod.make_primitives([(0.0, 0.0, 0.0)], [1.0])
        rays = Rays(origin=jnp.asarray([[0.0, 0.0, 3.0]]),
                    direction=jnp.asarray([[0.0, 0.0, -1.0]]),
                    tmin=jnp.asarray([1e-3]), tmax=jnp.asarray([1e9]))
        hits = mod.get("__intersection__sphere")(prims, rays)
        assert bool(hits.valid[0])
        np.testing.assert_allclose(float(hits.t[0]), 2.0, atol=1e-4)
        occ = mod.get("__intersection_any__sphere")(prims, rays)
        assert bool(occ[0])

    @pytest.mark.parametrize("kind", ["round_linear",
                                      "round_quadratic_bspline",
                                      "round_cubic_bspline",
                                      "round_catmullrom", "flat_quadratic"])
    def test_curve_kinds_intersect(self, kind):
        from optix_raytracer_tpu.core.rays import Rays
        mod = api.builtin_is_module(kind)
        control = np.asarray([[-1.0, 0.0, 0.0], [-0.4, 0.0, 0.0],
                              [0.4, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
        widths = np.full((4,), 0.25, np.float32)
        prims = mod.make_primitives(control, widths)
        # A ray straight down the y axis through the strand's midline.
        rays = Rays(origin=jnp.asarray([[0.0, 3.0, 0.0]]),
                    direction=jnp.asarray([[0.0, -1.0, 0.0]]),
                    tmin=jnp.asarray([1e-3]), tmax=jnp.asarray([1e9]))
        hits = mod.get(f"__intersection__{kind}")(prims, rays)
        assert bool(hits.valid[0]), kind
        # Round kinds hit the swept surface a radius above the midline;
        # the flat ribbon lies in-plane through y=0.
        expect = 3.0 if kind == "flat_quadratic" else 2.75
        np.testing.assert_allclose(float(hits.t[0]), expect, atol=0.1)

    def test_unknown_kind_raises(self):
        with pytest.raises(ValueError):
            api.builtin_is_module("torus")


class TestCallables:
    def test_direct_call_switch(self):
        table = api.CallableTable()
        table.add(lambda x: x + 1.0)
        i_mul = table.add(lambda x: x * 10.0)
        out = table.direct_call(jnp.int32(i_mul), jnp.float32(3.0))
        assert float(out) == 30.0
        # vectorized dispatch per lane
        idx = jnp.asarray([0, 1, 0, 1])
        vals = jnp.asarray([1.0, 1.0, 2.0, 2.0])
        out = jax.vmap(table.direct_call)(idx, vals)
        np.testing.assert_allclose(out, [2.0, 10.0, 3.0, 20.0])


class TestAccel:
    def test_build_and_memory(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        handle = api.build_gas(verts, np.array([[0, 1, 2]], np.int32))
        assert handle.memory_usage_bytes > 0
        assert handle.compacted_size_bytes == handle.memory_usage_bytes
        assert handle.bvh is None  # small → brute force

    def test_refit_moves_geometry(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        handle = api.build_gas(verts, np.array([[0, 1, 2]], np.int32))
        moved = api.refit_gas(handle, verts + np.array([5, 0, 0], np.float32))
        np.testing.assert_allclose(np.asarray(moved.geom.v0[0]), [5, 0, 0])

    def test_custom_gas(self):
        from optix_raytracer_tpu.accel import primitives as prim
        handle = api.build_custom_gas([
            {"kind": prim.SPHERE, "center": (0, 0, 0), "radius": 1.0}])
        assert handle.prims.num == 1


class TestPipelineLaunch:
    def test_cornell_through_api(self):
        """Port of the optixPathTracer bring-up through the API surface."""
        verts, idx, tri_mat = quads_to_triangles(_CORNELL_QUADS)
        handle = api.build_gas(verts, idx)

        mod = api.Module({}, name="pathtrace")
        groups = [
            api.ProgramGroup(api.ProgramGroupKind.RAYGEN, "__raygen__rg", mod),
            api.ProgramGroup(api.ProgramGroupKind.MISS, "__miss__radiance", mod),
            api.ProgramGroup(api.ProgramGroupKind.HITGROUP,
                             "__closesthit__radiance", mod),
        ]
        sbt = api.ShaderBindingTable(
            raygen_record=api.SbtRecord(groups[0]),
            miss_records=[api.SbtRecord(groups[1],
                                        {"color": (0.0, 0.0, 0.0)})],
            hitgroup_records=[api.SbtRecord(groups[2], m)
                              for m in CORNELL_MATERIALS],
        )
        pipeline = api.Pipeline(program_groups=groups,
                                integrator="pathtrace", max_trace_depth=2,
                                samples_per_launch=2)
        light = ParallelogramLight.make(
            CORNELL_LIGHT_CORNER, CORNELL_LIGHT_V1, CORNELL_LIGHT_V2,
            CORNELL_LIGHT_EMISSION)
        w = h = 24
        cam = cornell_camera(w, h).params()
        film, rays = pipeline.launch(sbt, handle, cam, w, h,
                                     tri_sbt_index=tri_mat,
                                     area_light=light)
        assert int(film.subframe) == 2
        img = np.asarray(film.accum)
        assert np.isfinite(img).all() and img.max() > 0

        # progressive continuation across launches
        film2, _ = pipeline.launch(sbt, handle, cam, w, h, film=film,
                                   tri_sbt_index=tri_mat, area_light=light)
        assert int(film2.subframe) == 4


class TestStageTimers:
    def test_report(self):
        t = StageTimers()
        with t.stage("render"):
            pass
        with t.stage("display"):
            pass
        t.frame_done()
        rep = t.report()
        assert "render" in rep and "fps" in rep


class TestInstances:
    def test_two_level_intersection(self):
        import jax.numpy as jnp
        from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
        from optix_raytracer_tpu.accel.tlas import (intersect_instances,
                                                    make_instances)
        from optix_raytracer_tpu.core.rays import Rays
        from optix_raytracer_tpu.core import transforms as xf
        # unit triangle at origin, instanced at x=0 and x=5 (sbt offsets 0/3)
        verts = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]],
                         np.float32)
        geom = build_triangle_geometry(verts, np.array([[0, 1, 2]], np.int32))
        t0 = np.eye(4, dtype=np.float32)
        t1 = np.eye(4, dtype=np.float32)
        t1[0, 3] = 5.0
        t1[:3, :3] *= 2.0  # second instance scaled 2x
        inst = make_instances([t0, t1], sbt_offsets=[0, 3],
                              instance_ids=[7, 8])
        rays = Rays.make(
            jnp.asarray([[0, 0, 2.0], [5, 0, 2.0], [2.5, 0, 2.0]]),
            jnp.asarray([[0, 0, -1.0]] * 3))
        hits = intersect_instances(geom, inst, rays,
                                   tri_mat=jnp.zeros(1, jnp.int32))
        assert int(hits.inst_id[0]) == 7 and int(hits.mat_id[0]) == 0
        assert int(hits.inst_id[1]) == 8 and int(hits.mat_id[1]) == 3
        assert int(hits.prim_id[2]) == -1      # between the instances
        np.testing.assert_allclose(hits.t[0], 2.0, rtol=1e-5)
        np.testing.assert_allclose(hits.t[1], 2.0, rtol=1e-5)
        np.testing.assert_allclose(hits.normal[1], [0, 0, 1], atol=1e-5)

    def test_build_ias_api(self):
        from optix_raytracer_tpu import api
        inst = api.build_ias([np.eye(4, dtype=np.float32)])
        assert inst.num == 1
