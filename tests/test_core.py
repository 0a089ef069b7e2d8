"""Unit tests for core math: vecmath, rng, aabb, transforms, film, camera."""
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.core import aabb, film, rng, transforms, vecmath as vm
from optix_raytracer_tpu.core.camera import Camera, Trackball, generate_rays


class TestVecmath:
    def test_dot_cross_orthogonal(self):
        a = jnp.array([[1.0, 0, 0], [0, 1, 0]])
        b = jnp.array([[0.0, 1, 0], [0, 0, 1]])
        np.testing.assert_allclose(vm.dot(a, b), [0.0, 0.0])
        np.testing.assert_allclose(vm.cross(a, b), [[0, 0, 1], [1, 0, 0]], atol=1e-7)

    def test_normalize_unit_length(self):
        v = jnp.array([[3.0, 4.0, 0.0], [1e-3, 0, 0]])
        n = vm.normalize(v)
        np.testing.assert_allclose(vm.length(n), [1.0, 1.0], rtol=1e-6)

    def test_reflect(self):
        i = vm.normalize(jnp.array([[1.0, -1.0, 0.0]]))
        n = jnp.array([[0.0, 1.0, 0.0]])
        r = vm.reflect(i, n)
        np.testing.assert_allclose(r, vm.normalize(jnp.array([[1.0, 1.0, 0.0]])), atol=1e-6)

    def test_refract_straight_through(self):
        i = jnp.array([[0.0, -1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        d, ok = vm.refract(i, n, 1.0)
        assert bool(ok[0])
        np.testing.assert_allclose(d, i, atol=1e-6)

    def test_refract_tir(self):
        # Shallow angle going from dense to thin medium → TIR.
        i = vm.normalize(jnp.array([[1.0, -0.05, 0.0]]))
        n = jnp.array([[0.0, 1.0, 0.0]])
        _, ok = vm.refract(i, n, 1.5)
        assert not bool(ok[0])

    def test_onb_orthonormal(self):
        n = vm.normalize(jnp.array([[0.3, -0.5, 0.8], [0, 0, -1.0], [0, 0, 1.0]]))
        t, b = vm.orthonormal_basis(n)
        for pair in [(t, b), (t, n), (b, n)]:
            np.testing.assert_allclose(vm.dot(*pair), np.zeros(3), atol=1e-6)
        np.testing.assert_allclose(vm.length(t), np.ones(3), rtol=1e-5)
        # right-handed: t × b = n
        np.testing.assert_allclose(vm.cross(t, b), n, atol=1e-5)


class TestRng:
    def test_uniform_range_and_determinism(self):
        s = rng.seed(jnp.arange(4096, dtype=jnp.uint32), 7)
        u, s2 = rng.uniform(s)
        assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
        u_again, _ = rng.uniform(rng.seed(jnp.arange(4096, dtype=jnp.uint32), 7))
        np.testing.assert_array_equal(u, u_again)

    def test_uniform_mean_var(self):
        s = rng.seed(jnp.arange(1 << 16, dtype=jnp.uint32), 0)
        u, _ = rng.uniform(s)
        assert abs(float(u.mean()) - 0.5) < 5e-3
        assert abs(float(u.var()) - 1.0 / 12.0) < 5e-3

    def test_streams_decorrelated_across_subframes(self):
        idx = jnp.arange(1 << 14, dtype=jnp.uint32)
        u0, _ = rng.uniform(rng.seed(idx, 0))
        u1, _ = rng.uniform(rng.seed(idx, 1))
        corr = np.corrcoef(np.asarray(u0), np.asarray(u1))[0, 1]
        assert abs(corr) < 0.02


class TestAabb:
    def test_slab_hit_miss(self):
        lo = jnp.array([[-1.0, -1, -1]])
        hi = jnp.array([[1.0, 1, 1]])
        o = jnp.array([[0.0, 0, 5], [3.0, 0, 5]])
        d = jnp.array([[0.0, 0, -1], [0.0, 0, -1]])
        hit, t = aabb.intersect_ray(lo, hi, o, 1.0 / d, jnp.float32(0.0), jnp.float32(100.0))
        assert bool(hit[0]) and not bool(hit[1])
        np.testing.assert_allclose(t[0], 4.0, rtol=1e-6)

    def test_ray_inside_box(self):
        hit, t = aabb.intersect_ray(
            jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1]),
            jnp.array([0.0, 0, 0]), 1.0 / jnp.array([0.0, 0, 1.0]),
            jnp.float32(0.0), jnp.float32(100.0))
        assert bool(hit)

    def test_union_surface_area(self):
        a = (jnp.array([0.0, 0, 0]), jnp.array([1.0, 1, 1]))
        b = (jnp.array([2.0, 0, 0]), jnp.array([3.0, 1, 1]))
        lo, hi = aabb.union(a, b)
        np.testing.assert_allclose(lo, [0, 0, 0])
        np.testing.assert_allclose(hi, [3, 1, 1])
        assert float(aabb.surface_area((lo, hi))) == pytest.approx(2 * (3 + 1 + 3))


class TestTransforms:
    def test_compose_inverse_roundtrip(self):
        m = transforms.compose(transforms.translate(jnp.array([1.0, 2, 3])),
                               transforms.rotate([0, 1, 0], 0.7))
        p = jnp.array([[0.5, -0.25, 2.0]])
        q = transforms.apply_point(m, p)
        back = transforms.apply_point(transforms.inverse(m), q)
        np.testing.assert_allclose(back, p, atol=1e-5)

    def test_normal_transform_stays_perpendicular(self):
        m = transforms.compose(transforms.scale(jnp.array([2.0, 1.0, 0.5])),
                               transforms.rotate([1, 1, 0], 0.4))
        # tangent on a surface vs its normal
        tangent = jnp.array([1.0, 0.0, 0.0])
        normal = jnp.array([0.0, 0.0, 1.0])
        t2 = transforms.apply_vector(m, tangent)
        n2 = transforms.apply_normal(m, normal)
        assert abs(float(jnp.dot(t2, n2))) < 1e-5


class TestFilm:
    def test_accumulate_running_mean(self):
        f = film.Film.create(2, 2)
        vals = [1.0, 3.0, 8.0]
        for v in vals:
            f = f.accumulate(jnp.full((2, 2, 3), v))
        np.testing.assert_allclose(f.accum, np.mean(vals), rtol=1e-6)
        assert int(f.subframe) == 3

    def test_srgb_roundtrip(self):
        x = jnp.linspace(0, 1, 64)
        np.testing.assert_allclose(film.srgb_to_linear(film.linear_to_srgb(x)), x, atol=1e-5)

    def test_make_color_range(self):
        c = film.make_color(jnp.array([[[0.0, 0.5, 1.0]]]))
        assert c.dtype == jnp.uint8
        assert c.shape == (1, 1, 4)
        assert int(c[0, 0, 0]) == 0 and int(c[0, 0, 2]) == 255 and int(c[0, 0, 3]) == 255


class TestCamera:
    def test_center_ray_points_at_lookat(self):
        cam = Camera(eye=(0, 0, 5), lookat=(0, 0, 0), fov_y=45, aspect=2.0)
        rays, _ = generate_rays(cam.params(), 64, 32, jitter=False)
        center = rays.direction[16, 32]
        np.testing.assert_allclose(center, [0, 0, -1], atol=0.05)

    def test_fov_edges(self):
        cam = Camera(eye=(0, 0, 1), lookat=(0, 0, 0), fov_y=90, aspect=1.0)
        rays, _ = generate_rays(cam.params(), 129, 129, jitter=False)
        top = rays.direction[0, 64]
        # 90° fov → top edge ray at 45° above forward
        assert abs(float(top[1]) - np.sin(np.pi / 4)) < 0.02

    def test_orthographic_parallel(self):
        cam = Camera(eye=(0, 0, 5), lookat=(0, 0, 0), orthographic=True, ortho_height=4.0)
        rays, _ = generate_rays(cam.params(), 16, 16, jitter=False)
        d = np.asarray(rays.direction).reshape(-1, 3)
        assert np.allclose(d, d[0], atol=1e-6)
        o = np.asarray(rays.origin)
        assert o[:, :, 1].std() > 0.1  # origins spread on the film plane

    def test_trackball_orbit_preserves_radius(self):
        cam = Camera(eye=(0, 0, 5), lookat=(0, 0, 0))
        tb = Trackball(cam)
        tb.orbit(40, -25)
        r = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.lookat))
        assert r == pytest.approx(5.0, rel=1e-6)
