"""Ray-triangle intersection tests: Woop-matmul intersector vs a numpy
Möller–Trumbore oracle, plus occlusion / chunking / edge cases."""
import jax.numpy as jnp
import numpy as np

from optix_raytracer_tpu.accel import bruteforce as bf
from optix_raytracer_tpu.accel.geometry import build_triangle_geometry, shading_frame
from optix_raytracer_tpu.core.rays import Rays


def moller_trumbore_oracle(v0, e1, e2, o, d, tmin, tmax):
    """Scalar reference intersector (independent math path from the Woop one)."""
    best_t, best_id, best_uv = np.inf, -1, (0.0, 0.0)
    for m in range(v0.shape[0]):
        pvec = np.cross(d, e2[m])
        det = np.dot(e1[m], pvec)
        if abs(det) < 1e-12:
            continue
        inv_det = 1.0 / det
        tvec = o - v0[m]
        u = np.dot(tvec, pvec) * inv_det
        if u < 0 or u > 1:
            continue
        qvec = np.cross(tvec, e1[m])
        v = np.dot(d, qvec) * inv_det
        if v < 0 or u + v > 1:
            continue
        t = np.dot(e2[m], qvec) * inv_det
        if tmin < t < tmax and t < best_t:
            best_t, best_id, best_uv = t, m, (u, v)
    return best_t, best_id, best_uv


def random_mesh(rng, num_tris):
    v0 = rng.uniform(-1, 1, (num_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (num_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (num_tris, 3)).astype(np.float32)
    verts = np.concatenate([v0, v0 + e1, v0 + e2], axis=0).astype(np.float32)
    idx = np.stack([np.arange(num_tris), np.arange(num_tris) + num_tris,
                    np.arange(num_tris) + 2 * num_tris], axis=1).astype(np.int32)
    return verts, idx


class TestBruteForce:
    def test_single_triangle_hit_miss(self):
        verts = jnp.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]], jnp.float32)
        geom = build_triangle_geometry(verts, jnp.array([[0, 1, 2]], jnp.int32))
        rays = Rays.make(jnp.array([[0, 0, 2.0], [2, 2, 2.0]]),
                         jnp.array([[0, 0, -1.0], [0, 0, -1.0]]))
        h = bf.intersect_closest(geom, rays)
        assert int(h.prim_id[0]) == 0 and int(h.prim_id[1]) == -1
        np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
        occ = bf.intersect_any(geom, rays)
        assert bool(occ[0]) and not bool(occ[1])

    def test_matches_moller_trumbore_oracle(self):
        rng = np.random.default_rng(42)
        verts, idx = random_mesh(rng, 50)
        geom = build_triangle_geometry(verts, idx)
        v0 = verts[idx[:, 0]]
        e1 = verts[idx[:, 1]] - v0
        e2 = verts[idx[:, 2]] - v0

        n_rays = 200
        origins = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
        dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        rays = Rays.make(jnp.asarray(origins), jnp.asarray(dirs), tmin=1e-4, tmax=100.0)
        h = bf.intersect_closest(geom, rays)

        mismatches = 0
        for i in range(n_rays):
            t_ref, id_ref, uv_ref = moller_trumbore_oracle(
                v0, e1, e2, origins[i], dirs[i], 1e-4, 100.0)
            if id_ref != int(h.prim_id[i]):
                # Tolerate near-coincident surfaces (t within f32 noise).
                if id_ref >= 0 and int(h.prim_id[i]) >= 0 and \
                        abs(t_ref - float(h.t[i])) < 1e-3 * max(1.0, t_ref):
                    continue
                mismatches += 1
                continue
            if id_ref >= 0:
                assert abs(t_ref - float(h.t[i])) < 1e-3 * max(1.0, t_ref)
                assert abs(uv_ref[0] - float(h.uv[i, 0])) < 1e-2
                assert abs(uv_ref[1] - float(h.uv[i, 1])) < 1e-2
        assert mismatches == 0

    def test_chunked_equals_unchunked(self):
        rng = np.random.default_rng(1)
        verts, idx = random_mesh(rng, 9)
        geom = build_triangle_geometry(verts, idx)
        origins = rng.uniform(-2, 2, (301, 3)).astype(np.float32)
        dirs = rng.normal(size=(301, 3)).astype(np.float32)
        rays = Rays.make(jnp.asarray(origins), jnp.asarray(dirs))
        h_full = bf.intersect_closest(geom, rays, chunk_size=None)
        h_chunk = bf.intersect_closest(geom, rays, chunk_size=64)
        np.testing.assert_array_equal(h_full.prim_id, h_chunk.prim_id)
        np.testing.assert_allclose(h_full.t, h_chunk.t, rtol=1e-6)

    def test_batch_shape_preserved(self):
        verts = jnp.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], jnp.float32)
        geom = build_triangle_geometry(verts, jnp.array([[0, 1, 2]], jnp.int32))
        o = jnp.zeros((4, 8, 3)).at[..., 2].set(1.0)
        d = jnp.zeros((4, 8, 3)).at[..., 2].set(-1.0)
        h = bf.intersect_closest(geom, Rays.make(o, d))
        assert h.t.shape == (4, 8)
        assert h.uv.shape == (4, 8, 2)

    def test_degenerate_triangle_ignored(self):
        verts = jnp.array([[0, 0, 0], [1, 0, 0], [2, 0, 0],   # degenerate (collinear)
                           [-1, -1, -1], [1, -1, -1], [0, 1, -1]], jnp.float32)
        idx = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
        geom = build_triangle_geometry(verts, idx)
        rays = Rays.make(jnp.array([[0, 0, 2.0]]), jnp.array([[0, 0, -1.0]]))
        h = bf.intersect_closest(geom, rays)
        assert int(h.prim_id[0]) == 1  # hits the valid triangle behind

    def test_tmin_respected(self):
        # Two parallel triangles; tmin skips the closer one.
        verts = jnp.array([[-1, -1, 1], [1, -1, 1], [0, 1, 1],
                           [-1, -1, 0], [1, -1, 0], [0, 1, 0]], jnp.float32)
        idx = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
        geom = build_triangle_geometry(verts, idx)
        rays = Rays.make(jnp.array([[0, 0, 2.0]]), jnp.array([[0, 0, -1.0]]), tmin=1.5)
        h = bf.intersect_closest(geom, rays)
        assert int(h.prim_id[0]) == 1
        np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)

    def test_shading_frame(self):
        verts = jnp.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], jnp.float32)
        geom = build_triangle_geometry(verts, jnp.array([[0, 1, 2]], jnp.int32))
        frame = shading_frame(geom, jnp.array([0]), jnp.array([[0.25, 0.5]]))
        np.testing.assert_allclose(frame["position"], [[0.5, 1.0, 0.0]], atol=1e-6)
        np.testing.assert_allclose(frame["normal"], [[0, 0, 1.0]], atol=1e-6)


class TestAlphaShadowDepth:
    """scene_any must re-enter past MANY masked surfaces (the old 4-step
    unroll silently declared deep stacks blocked)."""

    def _stack_scene(self, n_masked, with_solid):
        import numpy as np
        from optix_raytracer_tpu.scene.device_scene import make_device_scene
        from optix_raytracer_tpu.shade import materials as mats

        verts, idx, tri_mat, uvs = [], [], [], []
        def quad(z, m):
            b = len(verts)
            verts.extend([(0, 0, z), (1, 0, z), (1, 1, z), (0, 1, z)])
            uvs.extend([(0, 0), (1, 0), (1, 1), (0, 1)])
            idx.extend([(b, b + 1, b + 2), (b, b + 2, b + 3)])
            tri_mat.extend([m, m])
        for i in range(n_masked):
            quad(1.0 + i, 0)
        if with_solid:
            quad(1.0 + n_masked + 1.0, 1)
        materials = [
            {"kind": mats.DIFFUSE, "base_color": (0.5, 0.5, 0.5),
             "cutout": mats.CUT_CHECKER, "alpha_mode": mats.ALPHA_MASK,
             "checker_scale": 2.0},
            {"kind": mats.DIFFUSE, "base_color": (0.5, 0.5, 0.5)},
        ]
        return make_device_scene(
            np.asarray(verts, np.float32), np.asarray(idx, np.int32),
            np.asarray(tri_mat, np.int32), materials,
            uvs=np.asarray(uvs, np.float32))

    def _shoot(self, scene, x, y):
        import jax.numpy as jnp
        from optix_raytracer_tpu.core.rays import Rays
        from optix_raytracer_tpu.wavefront.intersect import scene_any
        o = jnp.asarray([[x, y, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        return bool(scene_any(scene, Rays.make(o, d, tmin=1e-3,
                                               tmax=100.0))[0])

    def test_escapes_through_ten_masked_surfaces(self):
        scene = self._stack_scene(10, with_solid=False)
        # (0.2, 0.2): checker cell (0,0) -> hole in every stacked quad
        assert self._shoot(scene, 0.2, 0.2) is False

    def test_solid_behind_deep_stack_blocks(self):
        scene = self._stack_scene(10, with_solid=True)
        assert self._shoot(scene, 0.2, 0.2) is True

    def test_solid_checker_cell_blocks_immediately(self):
        scene = self._stack_scene(10, with_solid=False)
        # (0.7, 0.2): checker cell (1,0) -> opaque
        assert self._shoot(scene, 0.7, 0.2) is True
