"""PBR GGX path-tracer lanes: white-furnace energy tests + sanity.

A furnace test surrounds a sphere with uniform unit radiance (miss color =
1): an energy-conserving BRDF + unbiased estimator must return ≈1 everywhere
on the sphere. The UE4-style metallic-roughness model is known to lose a
little energy at high roughness (single-scatter GGX) and gain ~4% from the
additive dielectric specular — the bounds below encode that envelope, and
would catch any estimator bug (wrong pdf, wrong cosine factor) immediately,
since those produce errors of 2x, not 5%.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.accel import primitives as prim
from optix_raytracer_tpu.core import film as film_mod
from optix_raytracer_tpu.core.camera import Camera
from optix_raytracer_tpu.scene.device_scene import make_device_scene
from optix_raytracer_tpu.shade import materials as mats
from optix_raytracer_tpu.wavefront.engine import render_accumulate


def furnace_scene(metallic, roughness):
    prims = prim.make_prims([
        {"kind": prim.SPHERE, "center": (0, 0, 0), "radius": 1.0,
         "mat_id": 0}])
    materials = [{"kind": mats.PBR, "base_color": (1.0, 1.0, 1.0),
                  "metallic": metallic, "roughness": roughness}]
    verts = np.zeros((3, 3), np.float32)
    idx = np.zeros((1, 3), np.int32)
    return make_device_scene(verts, idx, np.zeros(1, np.int32), materials,
                             prims=prims, miss_color=(1.0, 1.0, 1.0))


def render_furnace(metallic, roughness, samples=128, depth=8):
    scene = furnace_scene(metallic, roughness)
    assert scene.has_pbr
    w = h = 24
    cam = Camera(eye=(0, 0, 3.0), lookat=(0, 0, 0), fov_y=30,
                 aspect=1.0).params()
    film = film_mod.Film.create(h, w)
    film, _ = render_accumulate(scene, cam, film, w, h,
                                samples_per_launch=samples, max_depth=depth,
                                chunk_size=None, impl="xla")
    img = np.asarray(film.accum)
    # center pixels hit the sphere head-on
    return img[8:16, 8:16].mean(axis=(0, 1))


class TestFurnace:
    def test_dielectric_rough(self):
        mean = render_furnace(metallic=0.0, roughness=0.7)
        # lambert dominates: near-exact furnace (+ small additive 4% spec)
        assert 0.93 < mean.mean() < 1.10, mean

    def test_metal_mid_roughness(self):
        mean = render_furnace(metallic=1.0, roughness=0.4)
        # single-scatter GGX loses some energy; must stay below furnace+tol
        assert 0.55 < mean.mean() < 1.05, mean

    def test_blend(self):
        mean = render_furnace(metallic=0.5, roughness=0.5)
        assert 0.7 < mean.mean() < 1.08, mean


class TestPbrBehavior:
    def test_roughness_widens_ggx_lobe(self):
        """Under pure NEE (no BSDF-light MIS yet — TODO.md), an area light is
        only visible through the GGX lobe evaluated at the light direction:
        a rough lobe covers the light from most of the ball, a near-mirror
        lobe only where reflect(view) aligns exactly — so the rough ball
        collects far more energy here, and a mirror-sharp one almost none."""
        def render(rough):
            prims = prim.make_prims([
                {"kind": prim.SPHERE, "center": (0, 0, 0), "radius": 1.0,
                 "mat_id": 0}])
            materials = [{"kind": mats.PBR, "base_color": (0.9, 0.9, 0.9),
                          "metallic": 1.0, "roughness": rough}]
            # "light" = bright floor quad (area light via emission would need
            # NEE-vs-BSDF MIS; the background miss suffices here)
            scene = make_device_scene(
                np.zeros((3, 3), np.float32), np.zeros((1, 3), np.int32),
                np.zeros(1, np.int32), materials, prims=prims,
                miss_color=(0.0, 0.0, 0.0))
            # replace miss with directional-ish: put an emissive quad instead
            from optix_raytracer_tpu.shade.lights import ParallelogramLight
            light = ParallelogramLight.make((3.0, 2.0, -1.0), (0.0, 0, 2.0),
                                            (0.0, 2.0, 0.0), (30.0, 30.0, 30.0))
            scene = scene.replace(area_light=light)
            w = h = 32
            cam = Camera(eye=(0, 0, 3.2), lookat=(0, 0, 0), fov_y=35,
                         aspect=1.0).params()
            film = film_mod.Film.create(h, w)
            film, _ = render_accumulate(scene, cam, film, w, h,
                                        samples_per_launch=96, max_depth=2,
                                        chunk_size=None, impl="xla")
            return np.asarray(film.accum)

        sharp = render(0.08)
        rough = render(0.7)
        ball = (slice(8, 24), slice(8, 24))
        assert rough[ball].mean() > 10 * sharp[ball].mean()
        assert rough[ball].max() > 0.1
