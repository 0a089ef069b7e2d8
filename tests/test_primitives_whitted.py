"""Custom primitives (sphere/shell/parallelogram) + the Whitted integrator."""
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.accel import primitives as prim
from optix_raytracer_tpu.core.rays import Rays
from optix_raytracer_tpu.scene.builtins import whitted_camera, whitted_scene
from optix_raytracer_tpu.apps import whitted as whitted_app
from optix_raytracer_tpu.apps import sphere as sphere_app


def rays_from(o, d, tmax=100.0):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    return Rays.make(o, d, tmin=1e-4, tmax=tmax)


class TestSphere:
    def test_hit_distance_and_normal(self):
        prims = prim.make_prims([
            {"kind": prim.SPHERE, "center": (0, 0, 0), "radius": 1.0,
             "mat_id": 3}])
        h = prim.intersect_prims_closest(prims, rays_from([0, 0, 5], [0, 0, -1]))
        np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
        np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)
        assert int(h.mat_id[0]) == 3

    def test_inside_sphere_hits_far_side(self):
        prims = prim.make_prims([
            {"kind": prim.SPHERE, "center": (0, 0, 0), "radius": 1.0}])
        h = prim.intersect_prims_closest(prims, rays_from([0, 0, 0], [0, 0, -1]))
        np.testing.assert_allclose(h.t[0], 1.0, rtol=1e-5)

    def test_miss(self):
        prims = prim.make_prims([
            {"kind": prim.SPHERE, "center": (0, 0, 0), "radius": 1.0}])
        h = prim.intersect_prims_closest(prims, rays_from([0, 3, 5], [0, 0, -1]))
        assert int(h.prim_id[0]) == -1


class TestShell:
    def test_outer_then_inner(self):
        prims = prim.make_prims([
            {"kind": prim.SPHERE_SHELL, "center": (0, 0, 0),
             "radius_inner": 0.5, "radius_outer": 1.0}])
        h = prim.intersect_prims_closest(prims, rays_from([0, 0, 5], [0, 0, -1]))
        np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)      # outer surface
        np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)
        # from between the shells, the inner surface is closest, normal inward
        h2 = prim.intersect_prims_closest(
            prims, rays_from([0, 0, 0.75], [0, 0, -1]))
        np.testing.assert_allclose(h2.t[0], 0.25, rtol=1e-4)
        np.testing.assert_allclose(h2.normal[0], [0, 0, -1], atol=1e-4)


class TestParallelogram:
    def test_hit_uv(self):
        prims = prim.make_prims([
            {"kind": prim.PARALLELOGRAM, "anchor": (0, 0, 0),
             "v1": (2, 0, 0), "v2": (0, 0, 2)}])
        h = prim.intersect_prims_closest(
            prims, rays_from([0.5, 3, 1.0], [0, -1, 0]))
        np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-5)
        np.testing.assert_allclose(h.uv[0], [0.25, 0.5], atol=1e-5)

    def test_outside_bounds_misses(self):
        prims = prim.make_prims([
            {"kind": prim.PARALLELOGRAM, "anchor": (0, 0, 0),
             "v1": (2, 0, 0), "v2": (0, 0, 2)}])
        h = prim.intersect_prims_closest(
            prims, rays_from([3.0, 3, 1.0], [0, -1, 0]))
        assert int(h.prim_id[0]) == -1


class TestMergeHits:
    def test_closer_wins(self):
        prims = prim.make_prims([
            {"kind": prim.SPHERE, "center": (0, 0, 0), "radius": 1.0}])
        r = rays_from([0, 0, 5], [0, 0, -1])
        a = prim.intersect_prims_closest(prims, r)          # t = 4
        far = prim.make_prims([
            {"kind": prim.SPHERE, "center": (0, 0, -5), "radius": 1.0}])
        b = prim.intersect_prims_closest(far, r)            # t = 9
        merged = prim.merge_hits(b, a, prim_offset=10)
        np.testing.assert_allclose(merged.t[0], 4.0, rtol=1e-5)
        assert int(merged.prim_id[0]) == 10


class TestWhittedRender:
    @pytest.fixture(scope="class")
    def img(self):
        accum, _ = whitted_app.render(96, 72, samples=3, max_depth=4)
        return np.asarray(accum)

    def test_regions(self, img):
        assert np.isfinite(img).all() and (img >= 0).all()
        # sky at top: blue-ish miss color
        sky = img[2, 48]
        assert sky[2] > sky[0]
        # floor at bottom: checker (red/orange or yellow) → red channel high
        floor = img[-6:, :].reshape(-1, 3)
        assert floor[:, 0].mean() > 0.3

    def test_shadow_present(self, img):
        # floor luminance varies strongly (shadows + checker)
        floor = img[-20:, :].mean(axis=-1)
        assert floor.std() > 0.05

    def test_sphere_app(self):
        img = np.asarray(sphere_app.render(64, 64))
        assert img.shape == (64, 64, 4)
        center = img[32, 32]
        corner = img[1, 1]
        assert (center[:3] != corner[:3]).any()
