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

    def test_log2_floor_exact(self):
        # The float-exponent trick rounds UP just below powers of two
        # (>= 2^24); the builder needs the exact floor from clz.
        from optix_raytracer_tpu.accel.lbvh import _log2_floor
        vals = []
        for k in range(1, 32):
            vals += [(1 << k) - 1, 1 << k]
            if (1 << k) + 1 < (1 << 32):
                vals.append((1 << k) + 1)
        vals = np.array(vals, np.uint32)
        got = np.asarray(_log2_floor(jnp.asarray(vals)))
        want = np.floor(np.log2(vals.astype(np.float64))).astype(np.int64)
        np.testing.assert_array_equal(got, want)
        assert int(_log2_floor(jnp.uint32(0))) == -1

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_topology_adversarial_codes(self, seed):
        # Morton code sets clustered just below powers of two — the inputs
        # that made the inexact log2 produce invalid radix trees
        # (duplicated/missing leaves, cycles).
        from optix_raytracer_tpu.accel.lbvh import _build_topology
        rng = np.random.default_rng(seed)
        n = 257
        base = np.array([(1 << 24) - 1, (1 << 25) - 1, (1 << 27) - 1,
                         (1 << 29) - 1, (1 << 30) - 1], np.int64)
        codes = base[rng.integers(0, len(base), n)] \
            - rng.integers(0, 3, n) + rng.integers(0, 2, n)
        codes = np.sort(codes.astype(np.uint32))
        left, right = _build_topology(jnp.asarray(codes), n)
        self._check_topology(np.asarray(left), np.asarray(right), n)

    def test_topology_skewed_exponential_codes(self):
        # 0, 1, 3, 7, ... 2^k-1: maximally skewed radix tree (depth ~ bits);
        # validates the fixed-sweep refit bound on deep trees.
        from optix_raytracer_tpu.accel.lbvh import _build_topology
        codes = np.array([(1 << k) - 1 for k in range(31)], np.uint32)
        n = len(codes)
        left, right = _build_topology(jnp.asarray(codes), n)
        self._check_topology(np.asarray(left), np.asarray(right), n)

    @staticmethod
    def _check_topology(left, right, n):
        """Valid binary radix tree: every node except the root has exactly
        one parent, and DFS from the root reaches all n leaves once."""
        num_nodes = 2 * n - 1
        indeg = np.zeros(num_nodes, np.int64)
        np.add.at(indeg, left, 1)
        np.add.at(indeg, right, 1)
        assert indeg[0] == 0  # root
        assert (indeg[1:] == 1).all(), "duplicated or orphaned nodes"
        seen_leaves = []
        stack = [0]
        visited = 0
        while stack:
            node = stack.pop()
            visited += 1
            assert visited <= num_nodes, "cycle in radix tree"
            if node >= n - 1:
                seen_leaves.append(node - (n - 1))
            else:
                stack.append(int(left[node]))
                stack.append(int(right[node]))
        np.testing.assert_array_equal(np.sort(seen_leaves), np.arange(n))

    def test_flat_grid_traversal(self):
        # Flat axis-aligned quad grid: one morton axis fully degenerate.
        m = 12
        xs, ys = np.meshgrid(np.arange(m + 1, dtype=np.float32),
                             np.arange(m + 1, dtype=np.float32))
        verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
        quads = []
        for y in range(m):
            for x in range(m):
                a = y * (m + 1) + x
                quads += [[a, a + 1, a + m + 2], [a, a + m + 2, a + m + 1]]
        idx = np.array(quads, np.int32)
        geom = build_triangle_geometry(verts, idx)
        bvh = build_lbvh(geom)
        prim = np.asarray(bvh.node_prim)
        np.testing.assert_array_equal(np.sort(prim[prim >= 0]),
                                      np.arange(len(idx)))
        rng = np.random.default_rng(7)
        o = rng.uniform(0, m, (200, 3)).astype(np.float32)
        o[:, 2] = rng.uniform(1, 3, 200)
        d = rng.normal(size=(200, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3, tmax=100.)
        ref = bf.intersect_closest(geom, rays, tri_mat=None, impl="xla",
                                   chunk_size=None)
        out = traverse(bvh, geom, None, rays)
        np.testing.assert_array_equal(out.prim_id, ref.prim_id)

    def test_axis_aligned_ray_on_box_boundary(self):
        # Ray origin component exactly on a node bound + zero direction
        # component: the slab test must not produce NaN-driven false misses.
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                          [0, 0, 2], [1, 0, 2], [0, 1, 2]], np.float32)
        idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        geom = build_triangle_geometry(verts, idx)
        bvh = build_lbvh(geom)
        # origin x == 0 (a box bound), direction purely -z through both tris
        o = np.array([[0.25, 0.25, 5.0], [0.0, 0.25, 5.0]], np.float32)
        d = np.array([[0, 0, -1], [0, 0, -1]], np.float32)
        rays = Rays.make(jnp.asarray(o), jnp.asarray(d), tmin=1e-3, tmax=100.)
        out = traverse(bvh, geom, None, rays)
        assert np.asarray(out.valid).all()
        np.testing.assert_allclose(np.asarray(out.t), [3.0, 3.0], rtol=1e-5)

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
