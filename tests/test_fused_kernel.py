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

    @pytest.mark.parametrize("metallic,roughness",
                             [(0.8, 0.35), (0.0, 0.9), (1.0, 0.5)])
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
