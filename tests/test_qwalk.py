"""Cluster-major queue traversal (accel/qwalk.py) parity tests.

Runs the queue kernels in interpreter mode on CPU and pins exact
agreement with the brute-force intersector and the shipped cluster walk
on scattered (bounce-like) wavefronts — the workload the design targets.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optix_raytracer_tpu.accel import bruteforce as bf
from optix_raytracer_tpu.accel import clusters as cl
from optix_raytracer_tpu.accel import native, qwalk
from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
from optix_raytracer_tpu.core.rays import Rays
from optix_raytracer_tpu.scene.builtins import trefoil_mesh


@pytest.fixture(scope="module")
def knot():
    verts, idx, normals = trefoil_mesh(60, 20)
    geom = build_triangle_geometry(verts, idx, normals=normals)
    cs = cl.build_clusters(geom, jnp.zeros((geom.num_triangles,), jnp.int32),
                           order=native.sah_leaf_order(geom))
    return geom, cs


def _scattered_rays(n, seed=0, frac_dead=0.3):
    """Bounce-like wavefront: origins near the knot surface, random
    directions, a dead-lane tail (empty windows)."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full((n,), 1e16, np.float32)
    tmax[rng.random(n) < frac_dead] = 0.0
    return Rays(origin=jnp.asarray(o), direction=jnp.asarray(d),
                tmin=jnp.full((n,), 1e-3, jnp.float32),
                tmax=jnp.asarray(tmax))


class TestQueueAnyHit:
    def test_matches_bruteforce(self, knot):
        geom, cs = knot
        rays = _scattered_rays(1024)
        occ_q = np.asarray(qwalk.any_hit(cs, rays, interpret=True))
        occ_bf = np.asarray(bf.intersect_any(geom, rays))
        np.testing.assert_array_equal(occ_q, occ_bf)
        assert 0.0 < occ_q.mean() < 1.0

    def test_matches_gated_walk(self, knot):
        _, cs = knot
        rays = _scattered_rays(2048, seed=3)
        occ_q = np.asarray(qwalk.any_hit(cs, rays, interpret=True))
        occ_w = np.asarray(cl.any_hit(cs, rays, interpret=True, exact=True))
        np.testing.assert_array_equal(occ_q, occ_w)

    def test_overflow_falls_back(self, knot):
        geom, cs = knot
        rays = _scattered_rays(512, seed=5, frac_dead=0.0)
        # qf=1 is far under the true crossing count -> overflow -> the
        # lax.cond fallback (gated walk) must keep the answer exact
        stats = qwalk.queue_stats(cs, rays, qf=1, interpret=True)
        assert stats["overflow"]
        occ_q = np.asarray(qwalk.any_hit(cs, rays, interpret=True, qf=1))
        occ_bf = np.asarray(bf.intersect_any(geom, rays))
        np.testing.assert_array_equal(occ_q, occ_bf)


class TestQueueClosest:
    def test_matches_bruteforce(self, knot):
        geom, cs = knot
        rays = _scattered_rays(1024, seed=7)
        hq = qwalk.closest_hit(cs, rays, interpret=True)
        hb = bf.intersect_closest(geom, rays)
        np.testing.assert_array_equal(np.asarray(hq.prim_id),
                                      np.asarray(hb.prim_id))
        np.testing.assert_allclose(np.asarray(hq.t), np.asarray(hb.t),
                                   rtol=1e-5, atol=1e-5)
        hit = np.asarray(hq.prim_id) >= 0
        assert hit.any() and (~hit).any()
        np.testing.assert_allclose(np.asarray(hq.uv)[hit],
                                   np.asarray(hb.uv)[hit],
                                   rtol=1e-4, atol=1e-5)

    def test_matches_cluster_walk_bitwise(self, knot):
        """Same Woop math as the walk kernel -> prim/t/uv match exactly.
        Normals agree to the last ULP only (the a + u*b + v*c
        interpolation fuses differently in the two kernels' compilations
        — FMA association, not a semantic difference)."""
        _, cs = knot
        rays = _scattered_rays(2048, seed=11)
        hq = qwalk.closest_hit(cs, rays, interpret=True)
        hw = cl.closest_hit(cs, rays, interpret=True, exact=True)
        np.testing.assert_array_equal(np.asarray(hq.prim_id),
                                      np.asarray(hw.prim_id))
        np.testing.assert_array_equal(np.asarray(hq.t), np.asarray(hw.t))
        np.testing.assert_array_equal(np.asarray(hq.uv), np.asarray(hw.uv))
        np.testing.assert_allclose(np.asarray(hq.normal),
                                   np.asarray(hw.normal),
                                   rtol=2e-7, atol=2e-7)

    def test_queue_stats_sane(self, knot):
        _, cs = knot
        rays = _scattered_rays(4096, seed=13)
        # qf=16: this synthetic box-volume wavefront is ~70% live with
        # long rays, far denser than the bounce wavefronts the default
        # capacity (qf=6 items per TOTAL octet) is tuned for
        s = qwalk.queue_stats(cs, rays, qf=16, interpret=True)
        assert not s["overflow"]
        assert 0 < s["n_items"] <= s["k_cap"]
        # scattered short rays cross only a handful of clusters each
        assert s["items_per_live_octet"] < 16
