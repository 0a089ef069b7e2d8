"""Fused Pallas intersector vs the XLA matmul path — must agree exactly on
hit ids and to f32 tolerance on distances. Runs the kernels in interpreter
mode on CPU (same kernel code the TPU compiles)."""
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.accel import bruteforce as bf
from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
from optix_raytracer_tpu.core.rays import Rays

from test_intersect import random_mesh


@pytest.fixture(scope="module")
def mesh_and_rays():
    rng = np.random.default_rng(7)
    verts, idx = random_mesh(rng, 40)
    geom = build_triangle_geometry(verts, idx)
    tri_mat = jnp.asarray(rng.integers(0, 5, 40), jnp.int32)
    n_rays = 1500  # not a multiple of the 1024-ray block → exercises padding
    origins = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = Rays.make(jnp.asarray(origins), jnp.asarray(dirs),
                     tmin=1e-3, tmax=50.0)
    return geom, tri_mat, rays


class TestPallasClosest:
    def test_matches_xla_path(self, mesh_and_rays):
        geom, tri_mat, rays = mesh_and_rays
        ref = bf.intersect_closest(geom, rays, tri_mat=tri_mat, impl="xla",
                                   chunk_size=None)
        out = bf.intersect_closest(geom, rays, tri_mat=tri_mat,
                                   impl="pallas_interpret")
        np.testing.assert_array_equal(out.prim_id, ref.prim_id)
        np.testing.assert_array_equal(out.mat_id, ref.mat_id)
        hit = np.asarray(ref.valid)
        np.testing.assert_allclose(np.asarray(out.t)[hit],
                                   np.asarray(ref.t)[hit], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out.uv)[hit],
                                   np.asarray(ref.uv)[hit], atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.normal)[hit],
                                   np.asarray(ref.normal)[hit], atol=1e-5)

    def test_miss_semantics(self, mesh_and_rays):
        geom, tri_mat, rays = mesh_and_rays
        out = bf.intersect_closest(geom, rays, tri_mat=tri_mat,
                                   impl="pallas_interpret")
        miss = ~np.asarray(out.valid)
        assert miss.any()
        np.testing.assert_array_equal(np.asarray(out.mat_id)[miss], -1)
        np.testing.assert_allclose(np.asarray(out.t)[miss],
                                   np.asarray(rays.tmax)[miss])


class TestPallasAnyHit:
    def test_matches_xla_path(self, mesh_and_rays):
        geom, _, rays = mesh_and_rays
        ref = bf.intersect_any(geom, rays, impl="xla", chunk_size=None)
        out = bf.intersect_any(geom, rays, impl="pallas_interpret")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
