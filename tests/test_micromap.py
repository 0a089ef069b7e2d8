"""Micromaps: opacity classification + displacement tessellation."""
import numpy as np
import pytest

from optix_raytracer_tpu.accel import micromap as mm


class TestOpacityMicromap:
    def test_uniform_regions_classified(self):
        # triangle 0 entirely in a hole cell, triangle 1 entirely solid
        # (checker scale 1: cell [0,1)² is a hole since (0+0)%2<1)
        corner_uv = np.array([
            [[0.1, 0.1], [0.3, 0.1], [0.2, 0.3]],      # inside hole cell
            [[1.1, 0.1], [1.3, 0.1], [1.2, 0.3]],      # inside solid cell
            [[0.5, 0.5], [1.5, 0.5], [1.0, 1.5]],      # straddles cells
        ], np.float32)
        states, summary = mm.build_opacity_micromap(
            corner_uv, mm.checker_mask(1.0), level=3)
        assert summary[0] == mm.TRANSPARENT
        assert summary[1] == mm.OPAQUE
        assert summary[2] == mm.UNKNOWN_OPAQUE
        assert states.shape == (3, 4 ** 3)

    def test_circle_mask(self):
        fn = mm.circle_mask(1.0, radius=0.25)
        uv = np.array([[0.5, 0.5], [0.05, 0.05]], np.float32)
        holes = fn(uv)
        assert holes[0] and not holes[1]  # cell center is in the hole


class TestDisplacedMicromesh:
    def test_subdivision_counts(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        idx = np.array([[0, 1, 2]], np.int32)
        nv, ni = mm.displace_mesh(verts, idx, 0.0, level=3)
        assert ni.shape == (4 ** 3, 3)
        # lattice vertex count: (n+1)(n+2)/2 with n=8
        assert nv.shape == (9 * 10 // 2, 3)

    def test_zero_displacement_preserves_plane(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        idx = np.array([[0, 1, 2]], np.int32)
        nv, _ = mm.displace_mesh(verts, idx, 0.0, level=2)
        np.testing.assert_allclose(nv[:, 1], 0.0, atol=1e-7)

    def test_constant_displacement_moves_along_normal(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        idx = np.array([[0, 1, 2]], np.int32)
        nv, _ = mm.displace_mesh(verts, idx, 0.5, level=1)
        # face normal is -y for this winding... magnitude is what matters
        np.testing.assert_allclose(np.abs(nv[:, 1]), 0.5, atol=1e-6)

    def test_renders(self):
        from optix_raytracer_tpu.apps import displaced_micromesh as dmm
        accum, n_tris = dmm.render(32, 32, level=2, samples=1)
        assert n_tris == 2 * 4 ** 2
        assert np.isfinite(np.asarray(accum)).all()

    def test_omm_app(self):
        from optix_raytracer_tpu.apps import opacity_micromap as omm
        accum, stats = omm.render(32, 32, samples=2, level=2)
        assert np.isfinite(np.asarray(accum)).all()
        assert 0.2 < stats["opaque_fraction"] < 0.8
        assert 0.2 < stats["transparent_fraction"] < 0.8
