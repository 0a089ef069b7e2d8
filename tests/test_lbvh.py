"""LBVH build invariants + traversal vs brute-force ground truth."""
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.accel import bruteforce as bf
from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
from optix_raytracer_tpu.accel.lbvh import build_lbvh
from optix_raytracer_tpu.accel.traverse import traverse
from optix_raytracer_tpu.core.rays import Rays

from test_intersect import random_mesh


def make_geom(num_tris, seed=0):
    rng = np.random.default_rng(seed)
    verts, idx = random_mesh(rng, num_tris)
    return build_triangle_geometry(verts, idx), rng


def make_rays(rng, n_rays):
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3, tmax=100.0)


class TestBuildInvariants:
    @pytest.mark.parametrize("n", [1, 2, 3, 17, 120])
    def test_structure(self, n):
        geom, _ = make_geom(n)
        bvh = build_lbvh(geom)
        num_nodes = 2 * n - 1
        assert bvh.node_prim.shape == (num_nodes,)
        prim = np.asarray(bvh.node_prim)
        skip = np.asarray(bvh.node_skip)
        lo = np.asarray(bvh.node_lo)
        hi = np.asarray(bvh.node_hi)
        # every triangle appears exactly once as a leaf
        leaves = np.sort(prim[prim >= 0])
        np.testing.assert_array_equal(leaves, np.arange(n))
        # skip pointers move strictly forward and stay in bounds
        assert (skip > np.arange(num_nodes)).all()
        assert (skip <= num_nodes).all()
        # parent boxes contain children: node i+1 (first child) inside node i
        internal = prim < 0
        if internal.any():
            i = np.where(internal)[0]
            assert (lo[i] <= lo[i + 1] + 1e-5).all()
            assert (hi[i] >= hi[i + 1] - 1e-5).all()
        # root box contains all leaves
        assert (lo[0] <= lo.min(axis=0) + 1e-5).all()
        assert (hi[0] >= hi.max(axis=0) - 1e-5).all()

    def test_duplicate_centroids(self):
        # identical triangles → identical morton codes; index tiebreak must
        # still build a valid tree
        tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        verts = np.tile(tri, (8, 1))
        idx = (np.arange(24).reshape(8, 3)).astype(np.int32)
        geom = build_triangle_geometry(verts, idx)
        bvh = build_lbvh(geom)
        prim = np.asarray(bvh.node_prim)
        np.testing.assert_array_equal(np.sort(prim[prim >= 0]), np.arange(8))


class TestTraversal:
    @pytest.mark.parametrize("n_tris", [2, 25, 120])
    def test_closest_matches_bruteforce(self, n_tris):
        geom, rng = make_geom(n_tris, seed=n_tris)
        bvh = build_lbvh(geom)
        tri_mat = jnp.asarray(rng.integers(0, 4, n_tris), jnp.int32)
        rays = make_rays(rng, 300)
        ref = bf.intersect_closest(geom, rays, tri_mat=tri_mat, impl="xla",
                                   chunk_size=None)
        out = traverse(bvh, geom, tri_mat, rays)
        np.testing.assert_array_equal(out.prim_id, ref.prim_id)
        np.testing.assert_array_equal(out.mat_id, ref.mat_id)
        hit = np.asarray(ref.valid)
        np.testing.assert_allclose(np.asarray(out.t)[hit],
                                   np.asarray(ref.t)[hit], rtol=1e-5)

    def test_any_hit_matches(self):
        geom, rng = make_geom(60, seed=5)
        bvh = build_lbvh(geom)
        rays = make_rays(rng, 400)
        ref = bf.intersect_any(geom, rays, impl="xla", chunk_size=None)
        out = traverse(bvh, geom, None, rays, any_hit=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_tmax_respected(self):
        geom, rng = make_geom(30, seed=9)
        bvh = build_lbvh(geom)
        o = np.zeros((64, 3), np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        near = Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3, tmax=0.3)
        far = Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3, tmax=100.0)
        h_near = traverse(bvh, geom, None, near)
        h_far = traverse(bvh, geom, None, far)
        tn = np.asarray(h_near.t)
        assert (tn[np.asarray(h_near.valid)] <= 0.3).all()
        # every near hit is also a far hit with the same t
        vn = np.asarray(h_near.valid)
        np.testing.assert_allclose(tn[vn], np.asarray(h_far.t)[vn], rtol=1e-6)
