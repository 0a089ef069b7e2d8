"""Curves (splines/capsules/.hair) + motion blur (2-key vertices, SRT)."""
import io
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.accel import curves as cv
from optix_raytracer_tpu.accel import motion, primitives as prim
from optix_raytracer_tpu.core.rays import Rays


class TestSplines:
    def test_linear_passes_through_controls(self):
        ctrl = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
        w = np.array([0.1, 0.2, 0.3], np.float32)
        pts, rad, us = cv.eval_spline(ctrl, w, cv.LINEAR, 4)
        np.testing.assert_allclose(pts[0], ctrl[0], atol=1e-6)
        np.testing.assert_allclose(pts[-1], ctrl[-1], atol=1e-6)
        assert us[0] == 0.0 and us[-1] == 1.0

    def test_bspline_inside_hull(self):
        rng = np.random.default_rng(0)
        ctrl = rng.uniform(-1, 1, (7, 3)).astype(np.float32)
        w = np.full(7, 0.1, np.float32)
        pts, _, _ = cv.eval_spline(ctrl, w, cv.CUBIC_BSPLINE, 8)
        lo, hi = ctrl.min(0), ctrl.max(0)
        assert (pts >= lo - 1e-5).all() and (pts <= hi + 1e-5).all()

    def test_catmullrom_interpolates_inner_controls(self):
        ctrl = np.array([[0, 0, 0], [1, 0, 0], [2, 1, 0], [3, 1, 0],
                         [4, 0, 0]], np.float32)
        w = np.full(5, 0.1, np.float32)
        pts, _, _ = cv.eval_spline(ctrl, w, cv.CATMULL_ROM, 8)
        # each inner control point appears on the curve
        for target in ctrl[1:-1]:
            d = np.linalg.norm(pts - target, axis=1).min()
            assert d < 1e-4

    def test_bezier_endpoints(self):
        ctrl = np.array([[0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0]],
                        np.float32)
        w = np.full(4, 0.1, np.float32)
        pts, _, _ = cv.eval_spline(ctrl, w, cv.BEZIER, 8)
        np.testing.assert_allclose(pts[0], ctrl[0], atol=1e-6)
        np.testing.assert_allclose(pts[-1], ctrl[-1], atol=1e-5)


class TestCapsule:
    def test_body_hit(self):
        prims = prim.make_prims([{"kind": prim.CAPSULE, "p0": (-1, 0, 0),
                                  "p1": (1, 0, 0), "radius": 0.25}])
        r = Rays.make(jnp.asarray([[0, 0, 2.0]]), jnp.asarray([[0, 0, -1.0]]))
        h = prim.intersect_prims_closest(prims, r)
        np.testing.assert_allclose(h.t[0], 1.75, rtol=1e-4)
        np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-4)
        assert 0.4 < float(h.uv[0, 0]) < 0.6  # mid-strand u

    def test_cap_hit(self):
        prims = prim.make_prims([{"kind": prim.CAPSULE, "p0": (-1, 0, 0),
                                  "p1": (1, 0, 0), "radius": 0.25}])
        r = Rays.make(jnp.asarray([[3.0, 0, 0]]), jnp.asarray([[-1.0, 0, 0]]))
        h = prim.intersect_prims_closest(prims, r)
        np.testing.assert_allclose(h.t[0], 1.75, rtol=1e-4)
        np.testing.assert_allclose(h.normal[0], [1, 0, 0], atol=1e-4)

    def test_miss_beside(self):
        prims = prim.make_prims([{"kind": prim.CAPSULE, "p0": (-1, 0, 0),
                                  "p1": (1, 0, 0), "radius": 0.25}])
        r = Rays.make(jnp.asarray([[0, 1.0, 2.0]]),
                      jnp.asarray([[0, 0, -1.0]]))
        h = prim.intersect_prims_closest(prims, r)
        assert int(h.prim_id[0]) == -1


class TestHairFile:
    def test_roundtrip(self, tmp_path):
        # write a tiny 2-strand .hair file
        pts = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0],
                        [1, 0, 0], [1, 1, 0]], np.float32)
        segments = np.array([2, 1], np.uint16)
        thick = np.linspace(0.1, 0.05, 5).astype(np.float32)
        header = struct.pack("<4sIIIIIII", b"HAIR", 2, 5, 1 | 2 | 4,
                             0, 0, 0, 0)
        header += struct.pack("<f", 0.1)
        header += b"\x00" * (128 - len(header))
        blob = header + segments.tobytes() + pts.tobytes() + thick.tobytes()
        path = tmp_path / "test.hair"
        path.write_bytes(blob)
        strands, radii = cv.load_hair_file(str(path))
        assert len(strands) == 2
        assert strands[0].shape == (3, 3)
        assert strands[1].shape == (2, 3)
        np.testing.assert_allclose(radii[0], thick[:3])


class TestMotion:
    def test_moving_triangle_time_dependence(self):
        verts0 = np.array([[-2, -1, 0], [-1, -1, 0], [-1.5, 1, 0]], np.float32)
        verts1 = verts0 + np.array([3.0, 0, 0], np.float32)
        tris = motion.MotionTriangles.make(verts0, verts1,
                                           np.array([[0, 1, 2]], np.int32))
        o = jnp.asarray([[-1.5, 0, 2.0], [1.5, 0, 2.0]])
        d = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]])
        rays = Rays.make(o, d)
        # at t=0 only the left ray hits; at t=1 only the right
        h0 = motion.intersect_motion_triangles(tris, rays,
                                               jnp.asarray([0.0, 0.0]))
        h1 = motion.intersect_motion_triangles(tris, rays,
                                               jnp.asarray([1.0, 1.0]))
        assert bool(h0.valid[0]) and not bool(h0.valid[1])
        assert not bool(h1.valid[0]) and bool(h1.valid[1])

    def test_moving_sphere(self):
        c0 = np.array([[0, -1, 0]], np.float32)
        c1 = np.array([[0, 1, 0]], np.float32)
        r = np.array([0.3], np.float32)
        rays = Rays.make(jnp.asarray([[0, 0, 3.0]]),
                         jnp.asarray([[0, 0, -1.0]]))
        h_mid = motion.intersect_motion_spheres(c0, c1, r, rays,
                                                jnp.asarray([0.5]))
        h_t0 = motion.intersect_motion_spheres(c0, c1, r, rays,
                                               jnp.asarray([0.0]))
        assert bool(h_mid.valid[0]) and not bool(h_t0.valid[0])

    def test_srt_roundtrip(self):
        import math
        key0 = motion.SRTKey.make()
        key1 = motion.SRTKey.make(
            quat=(0, 0, math.sin(0.5), math.cos(0.5)), trans=(1.0, 0, 0),
            scale=(2.0, 2.0, 2.0))
        times = jnp.asarray([0.0, 1.0])
        srt = motion.srt_interpolate(key0, key1, times)
        rays = Rays.make(jnp.asarray([[5.0, 0, 0], [5.0, 0, 0]]),
                         jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]]))
        obj = motion.rays_to_object_space(rays, srt)
        # t=0: identity → unchanged
        np.testing.assert_allclose(obj.origin[0], [5, 0, 0], atol=1e-5)
        # t=1: translate then inverse-rotate then inverse-scale
        p = np.asarray(obj.origin[1])
        expect = np.array([4.0 * math.cos(-1.0), 4.0 * math.sin(-1.0), 0]) / 2.0
        np.testing.assert_allclose(p, expect, atol=1e-4)


class TestAppsSmoke:
    def test_motion_blur_blurs(self):
        from optix_raytracer_tpu.apps import simple_motion_blur as smb
        accum, _ = smb.render(48, 48, samples=8)
        img = np.asarray(accum)
        assert np.isfinite(img).all()
        # blur: intermediate-intensity pixels exist between bg and full hits
        orange = (img[..., 0] > 0.2) & (img[..., 0] < 0.7)
        assert orange.sum() > 5

    def test_curves_render(self):
        from optix_raytracer_tpu.apps import curves as curves_app
        accum, _ = curves_app.render(48, 48, samples=2)
        img = np.asarray(accum)
        assert np.isfinite(img).all()
        # the strand is visible: some pixels differ from the miss color
        assert (np.abs(img - img[0, 0]).max(axis=-1) > 0.1).sum() > 20

    def test_motion_geometry_render(self):
        from optix_raytracer_tpu.apps import motion_geometry as mg
        accum, _ = mg.render(40, 40, samples=4)
        assert np.isfinite(np.asarray(accum)).all()

    def test_ribbons_render(self):
        from optix_raytracer_tpu.apps import ribbons
        accum, _ = ribbons.render(40, 40, samples=2)
        img = np.asarray(accum)
        assert np.isfinite(img).all()
        assert (np.abs(img - img[0, 0]).max(axis=-1) > 0.1).sum() > 20

    def test_hair_render_modes(self):
        from optix_raytracer_tpu.apps import hair
        a, _ = hair.render(32, 32, shading="strand_u", samples=1)
        b, _ = hair.render(32, 32, shading="strand_idx", samples=1)
        assert not np.allclose(np.asarray(a), np.asarray(b))
