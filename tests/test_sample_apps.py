"""Headless smoke + semantics tests for the sample-app batch
(cutouts / console / raycasting / dynamic geometry / dynamic materials)."""
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.apps import (console, cutouts, dynamic_geometry,
                                      dynamic_materials, raycasting)
from optix_raytracer_tpu.core.rays import Rays
from optix_raytracer_tpu.scene.builtins import cornell_box


class TestCutouts:
    def test_rays_pass_through_holes(self):
        """With checker cutouts on the tall block, some primary rays that
        would hit the block now reach the back wall."""
        from optix_raytracer_tpu.wavefront.intersect import scene_closest
        plain = cornell_box()
        cut = cutouts.cutout_cornell()
        # rays aimed at the tall block from the front
        n = 64
        ys = np.linspace(120, 300, n, dtype=np.float32)
        o = np.stack([np.full(n, 350.0), ys, np.full(n, -200.0)], 1)
        d = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
        rays = Rays.make(jnp.asarray(o), jnp.asarray(d))
        h_plain = scene_closest(plain, rays)
        h_cut = scene_closest(cut, rays)
        # cutout scene: same geometry, but holes in the block
        t_plain = np.asarray(h_plain.t)
        t_cut = np.asarray(h_cut.t)
        assert (t_cut >= t_plain - 1e-3).all()
        # but is_cut is handled by the integrator, not the intersector —
        # so here we render instead:
        accum, _ = cutouts.render(48, 48, samples=4, max_depth=3)
        img = np.asarray(accum)
        assert np.isfinite(img).all() and img.max() > 0

    def test_shadow_rays_respect_holes(self):
        """Occlusion through a cutout hole must differ from the plain scene."""
        from optix_raytracer_tpu.wavefront.intersect import scene_any
        plain = cornell_box()
        cut = cutouts.cutout_cornell()
        n = 128
        xs = np.linspace(270, 460, n, dtype=np.float32)
        # from the floor under the tall block straight up toward the light
        o = np.stack([xs, np.full(n, 1.0), np.full(n, 350.0)], 1)
        d = np.tile(np.array([[0, 1.0, 0]], np.float32), (n, 1))
        rays = Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=0.1, tmax=500.0)
        occ_plain = np.asarray(scene_any(plain, rays))
        occ_cut = np.asarray(scene_any(cut, rays))
        assert occ_cut.sum() < occ_plain.sum()


class TestConsole:
    def test_ascii_output(self, capsys):
        console.main(["--samples", "2"])
        out = capsys.readouterr().out
        lines = [l for l in out.splitlines() if l.strip()]
        assert len(lines) >= 20
        assert max(len(l) for l in lines) == console.WIDTH
        # the lamp shows as bright glyphs somewhere near the top
        ramp_hi = set("%@#*")
        assert any(c in ramp_hi for l in lines[:12] for c in l)


class TestRaycasting:
    def test_ortho_rays_cover_bbox(self):
        rays = raycasting.create_rays_ortho(16, 16, (0, 0, 0), (1, 2, 3))
        o = np.asarray(rays.origin)
        assert o[:, 0].min() < 0.1 and o[:, 0].max() > 0.9
        assert (o[:, 2] > 3.0).all()          # starts above the box
        d = np.asarray(rays.direction)
        np.testing.assert_allclose(d, [[0, 0, -1]] * 256)

    def test_cast_service(self):
        scene = cornell_box()
        rays = raycasting.create_rays_ortho(
            32, 32, (0, 0, 0), (556, 548.8, 559.2))
        # rays look down -z; rotate to face the box opening instead: use
        # custom rays straight into the box
        n = 32 * 32
        o = np.array(rays.origin)
        o[:, 2] = -10.0
        rays = Rays.make(jnp.asarray(o), jnp.asarray([[0, 0, 1.0]] * n))
        hits = raycasting.cast(scene, rays)
        assert np.asarray(hits.valid).mean() > 0.7
        shaded = np.asarray(raycasting.shade_hits(hits))
        assert shaded.shape == (n, 3)

    def test_translate(self):
        rays = raycasting.create_rays_ortho(4, 4, (0, 0, 0), (1, 1, 1))
        moved = raycasting.translate_rays(rays, (5.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(moved.origin[:, 0])
                                   - np.asarray(rays.origin[:, 0]), 5.0)


class TestDynamicGeometry:
    def test_animation_changes_image_and_refit_tracks(self):
        base_verts, idx = dynamic_geometry.make_grid_mesh(n=8)
        from optix_raytracer_tpu.api.accel import build_gas
        handle = build_gas(base_verts, idx)
        img0, handle = dynamic_geometry.render_frame(
            handle, 0.0, base_verts, 32, 32, samples=1)
        img1, handle = dynamic_geometry.render_frame(
            handle, 1.0, base_verts, 32, 32, samples=1)
        assert not np.allclose(np.asarray(img0), np.asarray(img1))

    def test_refit_preserves_topology(self):
        from optix_raytracer_tpu.api.accel import build_gas, refit_gas
        base_verts, idx = dynamic_geometry.make_grid_mesh(n=4)
        handle = build_gas(base_verts, idx)
        moved = refit_gas(handle,
                          np.asarray(dynamic_geometry.animate_vertices(
                              jnp.asarray(base_verts), 0.7)))
        np.testing.assert_array_equal(np.asarray(moved.geom.indices),
                                      np.asarray(handle.geom.indices))


class TestDynamicMaterials:
    def test_material_swap_changes_render(self):
        img0 = np.asarray(dynamic_materials.render(32, 32, samples=2, phase=0))
        img1 = np.asarray(dynamic_materials.render(32, 32, samples=2, phase=1))
        img2 = np.asarray(dynamic_materials.render(32, 32, samples=2, phase=2))
        assert not np.allclose(img0, img1)
        assert not np.allclose(img1, img2)

    def test_swap_is_functional(self):
        scene = cornell_box()
        scene2 = dynamic_materials.swap_material_color(scene, 0, (1, 0, 0))
        # original untouched
        np.testing.assert_allclose(np.asarray(scene.materials.base_color[0]),
                                   [0.8, 0.8, 0.8])
        np.testing.assert_allclose(np.asarray(scene2.materials.base_color[0]),
                                   [1, 0, 0])


class TestCustomPrimitive:
    """optixCustomPrimitive: user-authored IS over a custom AABB input."""

    def test_center_hits_edge_misses(self):
        from optix_raytracer_tpu.apps import custom_primitive as cp
        img = np.asarray(cp.render(32, 32))
        assert img[16, 16, :3].astype(int).sum() > 60   # sphere shaded
        assert img[0, 0, :3].astype(int).sum() == 0     # background black

    def test_aabb_gate_culls(self):
        from optix_raytracer_tpu.apps.custom_primitive import aabb_gate
        lo = jnp.asarray([-1.0, -1.0, -1.0])
        hi = jnp.asarray([1.0, 1.0, 1.0])
        o = jnp.asarray([[0.0, 0.0, 3.0], [5.0, 5.0, 3.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        tmin = jnp.zeros(2)
        tmax = jnp.full((2,), 100.0)
        g = np.asarray(aabb_gate(o, d, tmin, tmax, lo, hi))
        assert g[0] and not g[1]


class TestCallablePrograms:
    """optixCallablePrograms: run-time shader dispatch through the
    callable table; each dc_index must produce a distinct image."""

    def test_callables_differ_and_miss_shades(self):
        from optix_raytracer_tpu.apps import callable_programs as cb
        imgs = [np.asarray(cb.render(24, 24, shade=i)) for i in range(3)]
        assert not np.array_equal(imgs[0], imgs[1])
        assert not np.array_equal(imgs[1], imgs[2])
        # miss pixels use the continuation callable (raydir background):
        # corner ray directions differ -> nonconstant, nonzero background
        corner = imgs[2][0, 0, :3]
        other = imgs[2][0, -1, :3]
        assert corner.sum() > 0 and not np.array_equal(corner, other)

    def test_normal_shade_faces_camera(self):
        from optix_raytracer_tpu.apps import callable_programs as cb
        img = np.asarray(cb.render(24, 24, shade=2))
        c = img[12, 12, :3].astype(float) / 255.0
        # n ~ +z toward the camera -> linear (0.5, 0.5, 1.0); the film
        # writes sRGB, so 0.5 -> ~0.735 (cuda/helpers.h:35-66)
        assert c[2] > 0.95
        assert abs(c[0] - 0.735) < 0.1 and abs(c[1] - 0.735) < 0.1


class TestBoundValues:
    """optixBoundValues: the specialized (bound light_samples) module must
    produce the identical image to the runtime-launch-param module."""

    def test_bound_equals_runtime(self):
        from optix_raytracer_tpu.apps import bound_values as bv
        a = np.asarray(bv.render(24, 24, light_samples=2, bound=True)[0])
        b = np.asarray(bv.render(24, 24, light_samples=2, bound=False)[0])
        np.testing.assert_array_equal(a, b)
        assert a[:, :, :3].sum() > 0        # walls actually lit


class TestCompileWithTasks:
    """optixCompileWithTasks: pooled AOT compiles return live executables."""

    def test_pool_compiles_and_executes(self):
        from optix_raytracer_tpu.apps import compile_with_tasks as cwt
        jobs = cwt.make_jobs(2, base=16)
        res, compiled = cwt.run(2, 2, base=16)
        assert res["compiled"] == 2
        out = compiled[0](jobs[0][1][0])
        assert tuple(out.shape) == (16, 16, 3)


class TestModuleCreateAbortApp:
    """optixModuleCreateAbort: the child compile dies on .abort() and a
    fresh one runs to completion (the hot-swap flow)."""

    def test_abort_kills_child(self):
        from optix_raytracer_tpu.api.module import AbortableCompile
        c = AbortableCompile("optix_raytracer_tpu.apps.module_create_abort",
                             "heavy_entry", [((8, 8), "float32")])
        c.abort()
        assert c.poll() is False

    def test_small_entry_completes(self):
        from optix_raytracer_tpu.api.module import AbortableCompile
        c = AbortableCompile("jax.numpy", "sin", [((4,), "float32")])
        # generous bound: the child cold-imports jax, and CI hosts may be
        # running a concurrent suite
        assert c.wait(timeout=600) is True


class TestNVLinkApp:
    """optixNVLink app: placement plan reports a real per-chip HBM drop and
    the placed render is bit-identical to replicated."""

    def test_placed_render_matches(self):
        import jax
        from optix_raytracer_tpu.apps import nvlink
        from optix_raytracer_tpu.multichip import memory, tiles
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        n = min(len(jax.devices()), 4)
        mesh = tiles.make_mesh(n_rows=n, n_samples=1,
                               devices=jax.devices()[:n])
        scene = nvlink.textured_scene(tex_px=64)
        placed, report = memory.place_scene_textures(scene, mesh,
                                                     budget_bytes=1)
        assert report["mode"].startswith("shard")
        drop = (memory.per_chip_texture_bytes(scene)
                / max(memory.per_chip_texture_bytes(placed), 1))
        assert drop >= 2.0
        a = nvlink.render(placed, 24, 24, samples=1, max_depth=2)
        b = nvlink.render(scene, 24, 24, samples=1, max_depth=2)
        np.testing.assert_array_equal(a, b)
