"""Absolute radiometry: the NEE estimator against an analytic view factor.

The golden-image and oracle tests check *relative* agreement; this test
pins the estimator's ABSOLUTE scale. A Lambertian floor lit by a rectangular
area light has a closed-form direct radiance:

    L_out = rho * L_e * F(p)

where F(p) is the classic differential-element-to-parallel-rectangle view
factor (irradiance E = pi * L_e * F, Lambertian exit radiance = rho*E/pi).
A uniform brightness bias of a few percent anywhere in the estimator chain
(a lost pi, a double-counted cosine, a wrong area factor) fails this test —
reference semantics: `optixPathTracer.cu:375-409` (NEE weight
nDl*LnDl*A/(pi*d^2)).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optix_raytracer_tpu.core import film as film_mod
from optix_raytracer_tpu.core.camera import Camera, generate_rays
from optix_raytracer_tpu.scene.device_scene import make_device_scene
from optix_raytracer_tpu.shade import materials as mat
from optix_raytracer_tpu.shade.lights import ParallelogramLight
from optix_raytracer_tpu.wavefront.engine import render_accumulate

RHO = 0.7
EMIT = 5.0
LIGHT_X = (-0.6, 0.4)     # deliberately off-center: exercises the general
LIGHT_Z = (-0.3, 0.7)     # signed corner decomposition
LIGHT_H = 1.0
W = H = 24
SAMPLES = 512


def corner_view_factor(a, b, c):
    """F from a differential element to an (a x b) parallel rectangle whose
    corner is directly above the element at distance c (standard closed
    form, e.g. Howell's catalog B-1)."""
    aa = a / c
    bb = b / c
    return (aa / np.sqrt(1 + aa * aa) * np.arctan(bb / np.sqrt(1 + aa * aa))
            + bb / np.sqrt(1 + bb * bb)
            * np.arctan(aa / np.sqrt(1 + bb * bb))) / (2.0 * np.pi)


def view_factor(px, pz):
    """F from a floor point (px, 0, pz) to the light rectangle at height
    LIGHT_H — signed 4-corner decomposition (valid inside and outside the
    rectangle's projection)."""
    f = 0.0
    for cx, xe in ((-1.0, LIGHT_X[0]), (1.0, LIGHT_X[1])):
        for cz, ze in ((-1.0, LIGHT_Z[0]), (1.0, LIGHT_Z[1])):
            # inclusion–exclusion over the odd primitive G(x, z) =
            # sign(x) sign(z) F_corner(|x|, |z|)
            f += (cx * cz * np.sign(xe - px) * np.sign(ze - pz)
                  * corner_view_factor(abs(xe - px) + 1e-12,
                                       abs(ze - pz) + 1e-12, LIGHT_H))
    return f


@pytest.fixture(scope="module")
def rendered():
    # Floor-only scene: bounce rays leave upward and miss, so ANY depth
    # renders exactly the direct term.
    floor = np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50],
                      [-50, 0, 50]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    light = ParallelogramLight.make(
        (LIGHT_X[0], LIGHT_H, LIGHT_Z[0]),
        (LIGHT_X[1] - LIGHT_X[0], 0.0, 0.0),
        (0.0, 0.0, LIGHT_Z[1] - LIGHT_Z[0]),
        (EMIT, EMIT, EMIT))
    scene = make_device_scene(
        floor, idx, np.zeros(2, np.int32),
        [{"kind": mat.DIFFUSE, "base_color": (RHO, RHO, RHO)}],
        area_light=light, miss_color=(0.0, 0.0, 0.0))

    cam = Camera(eye=(0.05, 2.0, 0.1), lookat=(0.05, 0.0, 0.1),
                 up=(0.0, 0.0, 1.0), fov_y=4.0, aspect=1.0)
    p = cam.params()
    film = film_mod.Film.create(H, W)
    film, _ = render_accumulate(scene, p, film, W, H,
                                samples_per_launch=SAMPLES, max_depth=2,
                                chunk_size=None)
    img = np.asarray(film.accum)    # accum IS the running sample mean

    # Analytic truth at each pixel center's floor hit point.
    rays, _ = generate_rays(p, W, H, rng_state=None, jitter=False)
    o = np.asarray(rays.origin).reshape(-1, 3)
    d = np.asarray(rays.direction).reshape(-1, 3)
    t = -o[:, 1] / d[:, 1]
    pts = o + t[:, None] * d
    truth = RHO * EMIT * np.array(
        [view_factor(x, z) for x, _, z in pts]).reshape(H, W)
    return img, truth


class TestAbsoluteScale:
    def test_direct_radiance_matches_view_factor(self, rendered):
        img, truth = rendered
        ratio = float(img[..., 0].mean() / truth.mean())
        # Monte-Carlo error at 512 spp over 576 pixels is ~0.1%; a 1.5%
        # band means any uniform +-3% estimator bias fails loudly.
        assert abs(ratio - 1.0) < 0.015, f"absolute scale off: {ratio:.4f}"

    def test_channels_equal_and_spatially_consistent(self, rendered):
        img, truth = rendered
        np.testing.assert_allclose(img[..., 0], img[..., 1], rtol=1e-5)
        # per-pixel agreement (looser: per-pixel MC noise)
        rel = img[..., 0] / np.maximum(truth, 1e-9) - 1.0
        assert np.abs(rel).mean() < 0.05

    def test_bias_detection_margin(self, rendered):
        img, truth = rendered
        for bias in (1.03, 0.97):
            ratio = float((img[..., 0] * bias).mean() / truth.mean())
            assert abs(ratio - 1.0) >= 0.015, (
                "test band too loose to catch a 3% bias")
