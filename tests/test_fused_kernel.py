"""Fused Pallas path-trace megakernel vs the XLA wavefront engine.

Both consume identical RNG streams, so images must agree to f32 reassociation
noise and traced-ray counts must match exactly. Kernel runs in interpreter
mode on CPU (same code the TPU compiles)."""
import numpy as np
import pytest

from optix_raytracer_tpu.core import film as film_mod
from optix_raytracer_tpu.scene.builtins import cornell_box, cornell_camera
from optix_raytracer_tpu.wavefront.engine import render_accumulate, render_sample
from optix_raytracer_tpu.wavefront.pallas_pt import render_sum_fused


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def _instanced_cube_scene():
    """Two transformed instances of a shared cube GAS + a floor instance,
    distinct sbt offsets — the minimal IAS scene (`Scene.cpp:1134-1213`)."""
    from optix_raytracer_tpu.scene.scene import Scene
    from optix_raytracer_tpu.shade import materials as mat
    from optix_raytracer_tpu.shade.lights import ParallelogramLight

    s_half = 0.5
    v = np.array([[x, y, z] for x in (-s_half, s_half)
                  for y in (-s_half, s_half)
                  for z in (-s_half, s_half)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)

    def xf(tx, ty, tz, s=1.0, deg=0.0):
        a = np.radians(deg)
        t = np.eye(4, dtype=np.float32)
        t[0, 0] = np.cos(a) * s
        t[0, 2] = np.sin(a) * s
        t[2, 0] = -np.sin(a) * s
        t[2, 2] = np.cos(a) * s
        t[1, 1] = s
        t[:3, 3] = (tx, ty, tz)
        return t

    sc = Scene()
    sc.add_material({"kind": mat.DIFFUSE, "base_color": (0.8, 0.3, 0.2)})
    sc.add_material({"kind": mat.DIFFUSE, "base_color": (0.2, 0.4, 0.8)})
    sc.add_material({"kind": mat.DIFFUSE, "base_color": (0.7, 0.7, 0.7)})
    mi = sc.add_mesh(v, f, material=0)
    floor = np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]],
                     np.float32)
    fidx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    fi = sc.add_mesh(floor, fidx, material=2)
    sc.add_instance(mi, xf(-1.1, 0.5, 0.0, 1.0, 25.0))
    sc.add_instance(mi, xf(1.0, 0.35, -0.4, 0.7, -40.0), sbt_offset=1)
    sc.add_instance(fi, np.eye(4, dtype=np.float32))
    light = ParallelogramLight.make((-1, 4, -1), (2, 0, 0), (0, 0, 2),
                                    (12.0, 12.0, 12.0))
    return sc.finalize(area_light=light)


class TestFusedKernel:
    def test_matches_engine_exactly(self, scene):
        w = h = 24
        cam = cornell_camera(w, h).params()
        r0, c0 = render_sample(scene, cam, w, h, 0, max_depth=2,
                               chunk_size=None)
        r1, c1 = render_sample(scene, cam, w, h, 1, max_depth=2,
                               chunk_size=None)
        ref = np.asarray(r0 + r1)
        out, count = render_sum_fused(scene, cam, w, h, 0,
                                      samples_per_launch=2, max_depth=2,
                                      interpret=True)
        assert float(count) == float(c0 + c1)  # identical RNG ⇒ same paths
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-3)

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_render_accumulate_fused_impl(self, scene):
        w = h = 16
        cam = cornell_camera(w, h).params()
        film0 = film_mod.Film.create(h, w)
        ref, _ = render_accumulate(scene, cam, film0, w, h,
                                   samples_per_launch=3, max_depth=2,
                                   chunk_size=None, impl="xla")
        out, _ = render_accumulate(scene, cam, film0, w, h,
                                   samples_per_launch=3, max_depth=2,
                                   impl="fused_interpret")
        assert int(out.subframe) == 3
        np.testing.assert_allclose(np.asarray(out.accum),
                                   np.asarray(ref.accum), atol=2e-3, rtol=1e-3)

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_regen_schedule_matches_lockstep(self, scene):
        """Path regeneration (persistent paths) must be bit-compatible
        with the lock-step schedule: per-(pixel,sample) RNG streams are
        independent, so only the iteration order changes."""
        w = h = 16
        cam = cornell_camera(w, h).params()
        r_lock, c_lock = render_sum_fused(scene, cam, w, h, 3,
                                          samples_per_launch=2, max_depth=3,
                                          interpret=True, regen=False)
        r_regen, c_regen = render_sum_fused(scene, cam, w, h, 3,
                                            samples_per_launch=2,
                                            max_depth=3,
                                            interpret=True, regen=True)
        assert float(c_lock) == float(c_regen)
        np.testing.assert_allclose(np.asarray(r_regen), np.asarray(r_lock),
                                   atol=1e-6)

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_tiled_offsets_match(self, scene):
        """Row-tile invocation (y0/full dims) must reproduce the full frame's
        rows — the multichip contract."""
        w, h = 16, 16
        cam = cornell_camera(w, h).params()
        full, _ = render_sum_fused(scene, cam, w, h, 0, samples_per_launch=1,
                                   max_depth=2, interpret=True)
        top, _ = render_sum_fused(scene, cam, w, 8, 0, samples_per_launch=1,
                                  max_depth=2, y0=0, full_width=w,
                                  full_height=h, interpret=True)
        bot, _ = render_sum_fused(scene, cam, w, 8, 0, samples_per_launch=1,
                                  max_depth=2, y0=8, full_width=w,
                                  full_height=h, interpret=True)
        np.testing.assert_allclose(np.asarray(top), np.asarray(full)[:8],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(bot), np.asarray(full)[8:],
                                   atol=1e-5)


class TestFusedPBR:
    """GGX-PBR lanes in the megakernel: same estimator, same RNG stream,
    same image as the XLA engine (which is furnace- and radiometry-tested)."""

    def _pbr_scene(self, metallic, roughness):
        import numpy as np
        from optix_raytracer_tpu.scene.builtins import (
            CORNELL_LIGHT_CORNER, CORNELL_LIGHT_V1, CORNELL_LIGHT_V2,
            CORNELL_LIGHT_EMISSION, CORNELL_MATERIALS, _CORNELL_QUADS,
            quads_to_triangles)
        from optix_raytracer_tpu.scene.device_scene import make_device_scene
        from optix_raytracer_tpu.shade import materials as mat
        from optix_raytracer_tpu.shade.lights import ParallelogramLight
        verts, idx, tri_mat = quads_to_triangles(_CORNELL_QUADS)
        mats = [dict(m) for m in CORNELL_MATERIALS]
        mats[0] = {"kind": mat.PBR, "base_color": (0.8, 0.6, 0.3),
                   "metallic": metallic, "roughness": roughness}
        light = ParallelogramLight.make(
            CORNELL_LIGHT_CORNER, CORNELL_LIGHT_V1, CORNELL_LIGHT_V2,
            CORNELL_LIGHT_EMISSION)
        return make_device_scene(verts, idx, tri_mat, mats,
                                 area_light=light)

    @pytest.mark.parametrize(
        "metallic,roughness",
        [(0.8, 0.35),
         pytest.param(0.0, 0.9, marks=pytest.mark.slow),
         pytest.param(1.0, 0.5, marks=pytest.mark.slow)])
    def test_pbr_matches_engine(self, metallic, roughness):
        import numpy as np
        from optix_raytracer_tpu.wavefront.engine import render_sample
        from optix_raytracer_tpu.wavefront.pallas_pt import render_sum_fused
        scene = self._pbr_scene(metallic, roughness)
        assert scene.has_pbr
        w = h = 32
        cam = cornell_camera(w, h).params()
        rx, _ = render_sample(scene, cam, w, h, 5, max_depth=3,
                              chunk_size=None)
        rf, _ = render_sum_fused(scene, cam, w, h, 5, samples_per_launch=1,
                                 max_depth=3, interpret=True)
        np.testing.assert_allclose(np.asarray(rf), np.asarray(rx),
                                   atol=2e-3)


class TestFusedPrims:
    """Custom prims inside the megakernel: sphere/shell/parallelogram/
    capsule intersectors + their shadow occlusion emitted inline, matching
    the XLA engine's scene_closest merge exactly (whitted-class scenes on
    the fast path — `cuda/geometry.cu:38-143` in the fused launch)."""

    def _prim_scene(self, with_glass=False):
        import numpy as np
        from optix_raytracer_tpu.accel import primitives as prim
        from optix_raytracer_tpu.scene.device_scene import make_device_scene
        from optix_raytracer_tpu.shade import materials as mat
        from optix_raytracer_tpu.shade.lights import ParallelogramLight
        # floor quad (triangles) + one of each supported prim
        S = 4.0
        verts = np.array([[-S, 0, -S], [S, 0, -S], [S, 0, S], [-S, 0, S]],
                         np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        prims = prim.make_prims([
            {"kind": prim.SPHERE, "center": (-1.2, 0.7, 0.0),
             "radius": 0.7, "mat_id": 1},
            {"kind": prim.SPHERE_SHELL, "center": (0.6, 0.8, 0.5),
             "radius_inner": 0.4, "radius_outer": 0.6,
             "mat_id": 3 if with_glass else 1},
            {"kind": prim.PARALLELOGRAM, "anchor": (-0.5, 1.8, -1.0),
             "v1": (1.5, 0.0, 0.0), "v2": (0.0, 0.0, 1.2), "mat_id": 2},
            {"kind": prim.CAPSULE, "p0": (1.2, 0.3, -1.2),
             "p1": (2.0, 1.2, -0.8), "radius": 0.25, "mat_id": 2},
        ])
        mats = [
            {"kind": mat.DIFFUSE, "base_color": (0.75, 0.75, 0.75)},
            {"kind": mat.DIFFUSE, "base_color": (0.8, 0.3, 0.2)},
            {"kind": mat.DIFFUSE, "base_color": (0.2, 0.4, 0.8)},
            {"kind": mat.GLASS, "base_color": (0.95, 0.95, 0.95),
             "ior": 1.5},
        ]
        light = ParallelogramLight.make((-1.0, 3.5, -1.0), (2.0, 0, 0),
                                        (0, 0, 2.0), (10.0, 10.0, 10.0))
        return make_device_scene(verts, idx, np.zeros(2, np.int32), mats,
                                 prims=prims, area_light=light)

    def _cam(self, w, h):
        from optix_raytracer_tpu.core.camera import Camera
        return Camera(eye=(0, 1.6, -5.5), lookat=(0, 0.8, 0),
                      up=(0, 1, 0), fov_y=40.0,
                      aspect=w / h).params()

    @pytest.mark.parametrize(
        "with_glass", [False, pytest.param(True, marks=pytest.mark.slow)])
    def test_prims_match_engine(self, with_glass):
        w = h = 24
        scene = self._prim_scene(with_glass)
        cam = self._cam(w, h)
        r0, c0 = render_sample(scene, cam, w, h, 0, max_depth=3,
                               chunk_size=None)
        r1, c1 = render_sample(scene, cam, w, h, 1, max_depth=3,
                               chunk_size=None)
        ref = np.asarray(r0 + r1)
        out, count = render_sum_fused(scene, cam, w, h, 0,
                                      samples_per_launch=2, max_depth=3,
                                      interpret=True)
        assert float(count) == float(c0 + c1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-3,
                                   rtol=1e-3)
        # prims must actually be visible: some pixels differ from a
        # prim-free render
        assert ref.max() > 0.05

    def test_auto_dispatch_accepts_prims(self):
        from optix_raytracer_tpu.wavefront.engine import _use_fused
        scene = self._prim_scene()
        import jax
        if jax.default_backend() in ("tpu", "axon"):
            assert _use_fused(scene, "auto")

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_instanced_matches_engine(self):
        """IAS scene inside the megakernel: per-instance object-space ray
        transform + inverse-transpose normal return + sbt-offset material
        remap must reproduce the XLA engine's tlas.intersect_instances
        result exactly (`Scene.cpp:1134-1213` kept on the fused path)."""
        scene = _instanced_cube_scene()
        w = h = 24
        from optix_raytracer_tpu.core.camera import Camera
        cam = Camera(eye=(0, 1.5, -6.0), lookat=(0, 0.5, 0), up=(0, 1, 0),
                     fov_y=45.0, aspect=1.0).params()
        r0, c0 = render_sample(scene, cam, w, h, 0, max_depth=3,
                               chunk_size=None)
        r1, c1 = render_sample(scene, cam, w, h, 1, max_depth=3,
                               chunk_size=None)
        ref = np.asarray(r0 + r1)
        out, count = render_sum_fused(scene, cam, w, h, 0,
                                      samples_per_launch=2, max_depth=3,
                                      interpret=True)
        assert float(count) == float(c0 + c1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-3,
                                   rtol=1e-3)
        # both instances must actually be visible (distinct sbt materials)
        assert ref.max() > 0.05

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_instanced_cornell_matches_engine(self):
        """The VERDICT acceptance scene: Cornell as an IAS (walls instance +
        two shared-box instances) through the megakernel."""
        from optix_raytracer_tpu.scene.builtins import (cornell_box_instanced,
                                                        cornell_camera)
        scene = cornell_box_instanced()
        assert scene.instances.num == 3
        w = h = 16
        cam = cornell_camera(w, h).params()
        r0, c0 = render_sample(scene, cam, w, h, 0, max_depth=2,
                               chunk_size=None)
        out, count = render_sum_fused(scene, cam, w, h, 0,
                                      samples_per_launch=1, max_depth=2,
                                      interpret=True)
        assert float(count) == float(c0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(r0),
                                   atol=3e-3, rtol=1e-3)

    def test_fused_gate_accepts_small_ias(self):
        import jax
        from optix_raytracer_tpu.wavefront.engine import _use_fused
        scene = _instanced_cube_scene()
        if jax.default_backend() in ("tpu", "axon"):
            assert _use_fused(scene, "auto")

    def test_swept_prims_stay_on_xla(self):
        import numpy as np
        from optix_raytracer_tpu.accel import curves as cv
        from optix_raytracer_tpu.accel import primitives as prim
        from optix_raytracer_tpu.scene.device_scene import make_device_scene
        from optix_raytracer_tpu.wavefront.engine import _use_fused
        control = np.array([[-1, 0, 0], [0, 1, 0], [1, 0, 0]], np.float32)
        widths = np.full(3, 0.2, np.float32)
        prims = prim.make_prims(cv.strand_to_swept_quads(control, widths))
        verts = np.zeros((3, 3), np.float32)
        idx = np.zeros((1, 3), np.int32)
        scene = make_device_scene(verts, idx, np.zeros(1, np.int32),
                                  [{"kind": 0}], prims=prims)
        assert not _use_fused(scene, "auto")
