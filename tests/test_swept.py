"""True swept quadratic-curve intersector vs oracles.

The SWEPT_QUAD primitive must (a) reduce exactly to a capsule for straight
constant-radius spans, (b) converge to the dense-tessellation limit for
curved varying-radius strands, and (c) produce unit outward normals and a
monotone strand-u — the built-in round-curve IS contract
(`optix_device.h:610-699`).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from optix_raytracer_tpu.accel import curves as cv
from optix_raytracer_tpu.accel import primitives as prim
from optix_raytracer_tpu.core.rays import Rays


def rand_rays(rng, n, lo=-3, hi=3):
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3, tmax=100.0)


class TestStraightSpan:
    def test_reduces_to_capsule(self):
        # collinear control points + constant width: the bspline span is the
        # straight segment between the two midpoints -> identical capsule
        control = np.array([[-1, 0, 0], [0, 0, 0], [1, 0, 0]], np.float32)
        widths = np.full(3, 0.3, np.float32)
        swq = prim.make_prims(cv.strand_to_swept_quads(control, widths))
        cap = prim.make_prims([{"kind": prim.CAPSULE,
                                "p0": (-0.5, 0, 0), "p1": (0.5, 0, 0),
                                "radius": 0.3}])
        rays = rand_rays(np.random.default_rng(0), 2000)
        hs = prim.intersect_prims_closest(swq, rays)
        hc = prim.intersect_prims_closest(cap, rays)
        agree = np.asarray(hs.valid) == np.asarray(hc.valid)
        assert agree.mean() > 0.995        # silhouette-grazing rays only
        both = np.asarray(hs.valid) & np.asarray(hc.valid)
        np.testing.assert_allclose(np.asarray(hs.t)[both],
                                   np.asarray(hc.t)[both], atol=2e-3)
        nd = np.sum(np.asarray(hs.normal)[both] * np.asarray(hc.normal)[both],
                    axis=-1)
        assert (nd > 0.999).mean() > 0.99


class TestCurvedSpan:
    def _strand(self):
        control = np.array([[-1.0, -0.4, 0.0], [0.0, 0.8, 0.3],
                            [1.0, -0.2, -0.2], [1.8, 0.5, 0.4]], np.float32)
        widths = np.array([0.25, 0.4, 0.15, 0.3], np.float32)
        return control, widths

    def test_matches_dense_tessellation(self):
        control, widths = self._strand()
        swq = prim.make_prims(cv.strand_to_swept_quads(control, widths))
        # oracle: 64 capsules per span
        pts, radii, _ = cv.eval_spline(control, widths,
                                       cv.QUADRATIC_BSPLINE,
                                       samples_per_segment=64)
        caps = prim.make_prims(cv.strand_to_capsules(pts, radii))
        rays = rand_rays(np.random.default_rng(1), 3000)
        hs = prim.intersect_prims_closest(swq, rays)
        hc = prim.intersect_prims_closest(caps, rays)
        vs = np.asarray(hs.valid)
        vc = np.asarray(hc.valid)
        assert (vs == vc).mean() > 0.98
        both = vs & vc
        assert both.sum() > 50
        # tessellation chords sit slightly inside the true surface
        np.testing.assert_allclose(np.asarray(hs.t)[both],
                                   np.asarray(hc.t)[both], atol=2e-2)

    def test_normals_unit_and_outward(self):
        control, widths = self._strand()
        swq = prim.make_prims(cv.strand_to_swept_quads(control, widths))
        rays = rand_rays(np.random.default_rng(2), 2000)
        h = prim.intersect_prims_closest(swq, rays)
        hit = np.asarray(h.valid)
        nrm = np.asarray(h.normal)[hit]
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                                   atol=1e-3)
        # normals face the incoming ray (outward surface)
        d = np.asarray(rays.direction)[hit]
        assert ((nrm * d).sum(-1) < 0).mean() > 0.97

    def test_strand_u_range_monotone_along_strand(self):
        control, widths = self._strand()
        swq = prim.make_prims(cv.strand_to_swept_quads(control, widths))
        # rays shooting straight down onto the strand at increasing x
        xs = np.linspace(-0.4, 1.3, 24).astype(np.float32)
        o = np.stack([xs, np.full_like(xs, 3.0), np.zeros_like(xs)], -1)
        d = np.tile(np.array([[0, -1, 0]], np.float32), (24, 1))
        rays = Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3,
                         tmax=10.0)
        h = prim.intersect_prims_closest(swq, rays)
        hit = np.asarray(h.valid)
        u = np.asarray(h.uv)[hit, 0]
        assert (np.diff(u) > -0.05).all()
        assert u.min() >= 0.0 and u.max() <= 1.0


class TestCubicSpan:
    def _strand(self):
        control = np.array([[-1.2, -0.4, 0.0], [-0.3, 0.8, 0.3],
                            [0.6, -0.5, -0.3], [1.4, 0.6, 0.2],
                            [2.2, -0.1, -0.4]], np.float32)
        widths = np.array([0.3, 0.45, 0.2, 0.35, 0.25], np.float32)
        return control, widths

    def test_straight_constant_span_reduces_to_capsule(self):
        # collinear control points + constant width: the cubic-bspline span
        # is the straight segment between the span endpoints
        control = np.array([[-1.5, 0, 0], [-0.5, 0, 0], [0.5, 0, 0],
                            [1.5, 0, 0]], np.float32)
        widths = np.full(4, 0.3, np.float32)
        swc = prim.make_prims(cv.strand_to_swept_cubics(control, widths))
        cap = prim.make_prims([{"kind": prim.CAPSULE,
                                "p0": (-0.5, 0, 0), "p1": (0.5, 0, 0),
                                "radius": 0.3}])
        rays = rand_rays(np.random.default_rng(5), 2000)
        hs = prim.intersect_prims_closest(swc, rays)
        hc = prim.intersect_prims_closest(cap, rays)
        agree = np.asarray(hs.valid) == np.asarray(hc.valid)
        assert agree.mean() > 0.995
        both = np.asarray(hs.valid) & np.asarray(hc.valid)
        np.testing.assert_allclose(np.asarray(hs.t)[both],
                                   np.asarray(hc.t)[both], atol=2e-3)

    @pytest.mark.parametrize("kind", [cv.CUBIC_BSPLINE, cv.CATMULL_ROM,
                                      cv.BEZIER])
    def test_matches_dense_tessellation(self, kind):
        control, widths = self._strand()
        swc = prim.make_prims(cv.strand_to_swept_cubics(control, widths,
                                                        kind=kind))
        # dense oracle: at 64 samples/segment the chord error of the
        # capsule tessellation itself exceeds the tight bound on grazing
        # silhouette rays (verified against a 4001-point union-of-spheres
        # scan); 256 makes the oracle an order tighter than the tolerance
        pts, radii, _ = cv.eval_spline(control, widths, kind,
                                       samples_per_segment=256)
        caps = prim.make_prims(cv.strand_to_capsules(pts, radii))
        # exterior origins only: for rays starting INSIDE the swept volume
        # the entry is ambiguous (the capsule oracle itself reports an
        # arbitrary member surface there)
        rng6 = np.random.default_rng(6)
        o = rng6.normal(size=(3000, 3)).astype(np.float32)
        o = o / np.linalg.norm(o, axis=1, keepdims=True) * 5.0
        o = o + np.array([0.5, 0.1, 0.0], np.float32)
        target = rng6.uniform(-1.2, 2.2, (3000, 3)).astype(np.float32)
        d = target - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3,
                         tmax=100.0)
        hs = prim.intersect_prims_closest(swc, rays)
        hc = prim.intersect_prims_closest(caps, rays)
        vs = np.asarray(hs.valid)
        vc = np.asarray(hc.valid)
        assert (vs == vc).mean() > 0.98
        both = vs & vc
        assert both.sum() > 50
        err = np.abs(np.asarray(hs.t)[both] - np.asarray(hc.t)[both])
        # tessellation chords graze differently on silhouette rays: hold
        # 99.5% to the tight bound, everything to a loose one
        assert (err < 2.5e-2).mean() > 0.995, err.max()
        assert err.max() < 0.1

    def test_normals_unit_and_outward(self):
        control, widths = self._strand()
        swc = prim.make_prims(cv.strand_to_swept_cubics(control, widths))
        rays = rand_rays(np.random.default_rng(7), 2000)
        h = prim.intersect_prims_closest(swc, rays)
        hit = np.asarray(h.valid)
        nrm = np.asarray(h.normal)[hit]
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                                   atol=1e-3)
        d = np.asarray(rays.direction)[hit]
        assert ((nrm * d).sum(-1) < 0).mean() > 0.97

    def test_mixed_quad_and_cubic_table(self):
        # both swept kinds in ONE prim table must dispatch independently
        controlq = np.array([[-1, 1.5, 0], [0, 1.5, 0], [1, 1.5, 0]],
                            np.float32)
        widthsq = np.full(3, 0.2, np.float32)
        control, widths = self._strand()
        descs = (cv.strand_to_swept_quads(controlq, widthsq, mat_id=1)
                 + cv.strand_to_swept_cubics(control, widths, mat_id=2))
        both = prim.make_prims(descs)
        rays = rand_rays(np.random.default_rng(8), 2000)
        h = prim.intersect_prims_closest(both, rays)
        hit = np.asarray(h.valid)
        mats = np.asarray(h.mat_id)[hit]
        assert (mats == 1).any() and (mats == 2).any()
