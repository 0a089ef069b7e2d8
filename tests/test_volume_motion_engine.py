"""Volume + motion blur composited into the MAIN engine.

Round-1 verdict item: DensityGrid transmittance / single scattering /
transmittance-weighted NEE inside trace_paths (`optixVolumeViewer/
volume.cu:284-366`), and 2-key motion triangles traced with per-path
shutter times through the standard path (`optixSimpleMotionBlur`).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from optix_raytracer_tpu.accel.volume import DensityGrid
from optix_raytracer_tpu.core import film as film_mod
from optix_raytracer_tpu.core.camera import Camera
from optix_raytracer_tpu.scene.device_scene import make_device_scene
from optix_raytracer_tpu.shade import materials as mat
from optix_raytracer_tpu.shade.lights import ParallelogramLight
from optix_raytracer_tpu.wavefront.engine import render_accumulate


def render(scene, cam, w=24, h=24, spl=64, depth=2):
    film = film_mod.Film.create(h, w)
    film, _ = render_accumulate(scene, cam.params(), film, w, h,
                                samples_per_launch=spl, max_depth=depth,
                                chunk_size=None)
    return np.asarray(film.accum)


def uniform_slab(lo, hi, res=8):
    return DensityGrid(density=jnp.ones((res, res, res), jnp.float32),
                       lo=jnp.asarray(lo, jnp.float32),
                       hi=jnp.asarray(hi, jnp.float32))


EMIT = 4.0
NO_LIGHT = ParallelogramLight.make((0, 0, 0), (1, 0, 0), (0, 0, 1),
                                   (0.0, 0.0, 0.0))


class TestVolumeInEngine:
    def _emissive_wall_scene(self, volume, sigma):
        # emissive wall at z = +2, camera looks straight through the slab
        verts = np.array([[-3, -3, 2], [3, -3, 2], [3, 3, 2], [-3, 3, 2]],
                         np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        mats_ = [{"kind": mat.DIFFUSE, "base_color": (0, 0, 0),
                  "emission": (EMIT, EMIT, EMIT)}]
        return make_device_scene(verts, idx, np.zeros(2, np.int32), mats_,
                                 area_light=NO_LIGHT, volume=volume,
                                 volume_sigma=sigma, volume_albedo=0.0)

    def test_beer_lambert_attenuation(self):
        sigma = 0.7
        slab = uniform_slab((-1, -1, -1), (1, 1, 1))
        scene = self._emissive_wall_scene(slab, sigma)
        cam = Camera(eye=(0, 0, -3), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y=5.0, aspect=1.0)
        img = render(scene, cam, spl=16, depth=1)
        want = EMIT * np.exp(-sigma * 2.0)   # slab thickness 2
        got = float(img[10:14, 10:14, 0].mean())
        np.testing.assert_allclose(got, want, rtol=0.02)

    def test_nee_shadow_transmittance(self):
        # floor below a slab, light above it: NEE shadow rays cross the
        # slab vertically -> direct light scaled by exp(-sigma * 1).
        sigma = 0.8
        slab = uniform_slab((-2, 0.5, -2), (2, 1.5, -0.0 + 2))
        floor = np.array([[-5, -1, -5], [5, -1, -5], [5, -1, 5], [-5, -1, 5]],
                         np.float32)
        idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
        light = ParallelogramLight.make((-0.2, 4.0, -0.2), (0.4, 0, 0),
                                        (0, 0, 0.4), (40.0, 40.0, 40.0))
        mats_ = [{"kind": mat.DIFFUSE, "base_color": (0.7, 0.7, 0.7)}]

        def build(vol_on):
            return make_device_scene(
                floor, idx, np.zeros(2, np.int32), mats_, area_light=light,
                volume=slab if vol_on else None, volume_sigma=sigma,
                volume_albedo=0.0)

        cam = Camera(eye=(0, 1.8, 0.001), lookat=(0, -1, 0), up=(0, 0, 1),
                     fov_y=4.0, aspect=1.0)
        # camera at y=1.8 looks down through the slab too: camera segment
        # crosses thickness 1 as well -> total exp(-sigma * 2)
        img_v = render(build(True), cam, spl=128, depth=1)
        img_0 = render(build(False), cam, spl=128, depth=1)
        ratio = float(img_v.mean() / img_0.mean())
        want = np.exp(-sigma * 2.0)
        np.testing.assert_allclose(ratio, want, rtol=0.06)

    def test_single_scattering_glows(self):
        # no surfaces at all: radiance must come from in-scatter only
        slab = uniform_slab((-1, -1, -1), (1, 1, 1))
        verts = np.zeros((3, 3), np.float32)
        idx = np.zeros((1, 3), np.int32)
        light = ParallelogramLight.make((-0.5, 3.0, -0.5), (1, 0, 0),
                                        (0, 0, 1), (30.0, 30.0, 30.0))
        scene = make_device_scene(
            verts, idx, np.zeros(1, np.int32),
            [{"kind": mat.DIFFUSE}], area_light=light, volume=slab,
            volume_sigma=0.5, volume_albedo=0.9)
        cam = Camera(eye=(0, 0, -4), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y=20.0, aspect=1.0)
        img = render(scene, cam, spl=8, depth=1)
        assert img[12, 12].mean() > 1e-3
        assert np.isfinite(img).all()


class TestMotionInEngine:
    def _scene(self, sweep):
        # emissive quad sweeping along +x between the two shutter keys
        q0 = np.array([[-0.25, -0.6, 0], [0.25, -0.6, 0], [0.25, 0.6, 0],
                       [-0.25, 0.6, 0]], np.float32)
        idx_q = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        verts1 = q0 + np.array([sweep, 0, 0], np.float32)
        empty_v = np.zeros((3, 3), np.float32)
        empty_i = np.zeros((1, 3), np.int32)
        return make_device_scene(
            empty_v, empty_i, np.zeros(1, np.int32),
            [{"kind": mat.DIFFUSE, "base_color": (0, 0, 0)},
             {"kind": mat.DIFFUSE, "base_color": (0, 0, 0),
              "emission": (5.0, 5.0, 5.0)}],
            area_light=NO_LIGHT,
            motion={"verts0": q0, "verts1": verts1, "indices": idx_q,
                    "tri_mat": 1})

    def _render(self, scene, spl=192):
        cam = Camera(eye=(0.6, 0, -4), lookat=(0.6, 0, 0), up=(0, 1, 0),
                     fov_y=30.0, aspect=1.0)
        return render(scene, cam, w=48, h=16, spl=spl, depth=1)

    def test_static_motion_matches_endpoints(self):
        img = self._render(self._scene(sweep=0.0))
        # zero sweep: a crisp quad at full emission
        assert img.max() > 4.5

    def test_blur_spans_the_sweep(self):
        img = self._render(self._scene(sweep=1.2))
        col = img.mean(axis=(0, 2))        # [W] brightness per column
        lit = col > 0.2 * col.max()
        # blurred footprint is much wider than the static quad (0.5 wide
        # vs 1.7 swept): and interior columns sit at partial intensity
        static = self._render(self._scene(sweep=0.0))
        scol = static.mean(axis=(0, 2))
        assert lit.sum() > 2.5 * (scol > 0.2 * scol.max()).sum()
        mid = col[lit].mean()
        assert 0.2 * scol.max() < mid < 0.9 * scol.max()

    def test_motion_casts_shadows(self):
        # moving occluder between light and floor: scene_any must see it
        q0 = np.array([[-0.5, 1.0, -0.5], [0.5, 1.0, -0.5],
                       [0.5, 1.0, 0.5], [-0.5, 1.0, 0.5]], np.float32)
        idx_q = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        floor = np.array([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                         np.float32)
        idx_f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
        light = ParallelogramLight.make((-0.2, 3.0, -0.2), (0.4, 0, 0),
                                        (0, 0, 0.4), (30.0, 30.0, 30.0))

        def build(with_occluder):
            kw = {}
            if with_occluder:
                kw["motion"] = {"verts0": q0, "verts1": q0,
                                "indices": idx_q, "tri_mat": 0}
            return make_device_scene(
                floor, idx_f, np.zeros(2, np.int32),
                [{"kind": mat.DIFFUSE, "base_color": (0.7, 0.7, 0.7)}],
                area_light=light, **kw)

        # camera sits BELOW the occluder so it sees the shadowed floor
        cam = Camera(eye=(0, 0.8, 0.001), lookat=(0, 0, 0), up=(0, 0, 1),
                     fov_y=8.0, aspect=1.0)
        img_open = render(build(False), cam, spl=48, depth=1)
        img_occ = render(build(True), cam, spl=48, depth=1)
        assert img_occ.mean() < 0.2 * img_open.mean()


class TestDistanceSampling:
    """sample_scatter: inverse-transform distance sampling along the
    marched optical depth (accel/volume.py)."""

    def test_uniform_slab_analytic(self):
        from optix_raytracer_tpu.accel import volume as vol
        slab = uniform_slab((-1, -1, -1), (1, 1, 1))
        n = 20000
        rng = np.random.default_rng(0)
        o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -3.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        sigma = 0.7
        u = jnp.asarray(rng.uniform(size=n).astype(np.float32))
        t_s, w, tau = vol.sample_scatter(
            slab, o, d, jnp.zeros(n), jnp.full(n, 100.0), sigma, u)
        # uniform density 1.0 over a length-2 chord: tau = 2 sigma
        np.testing.assert_allclose(np.asarray(tau), 2 * sigma, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(w), 1 - np.exp(-2 * sigma),
                                   rtol=1e-4)
        # scatter points lie inside the slab chord [2, 4]
        ts = np.asarray(t_s)
        assert (ts >= 2.0 - 1e-3).all() and (ts <= 4.0 + 1e-3).all()
        # depth into the medium follows the truncated-exponential CDF:
        # mean depth = (1 - (1+tau) e^-tau) / (sigma (1 - e^-tau))
        depth = ts - 2.0
        tau_t = 2 * sigma
        want_mean = (1 - (1 + tau_t) * np.exp(-tau_t)) \
            / (sigma * (1 - np.exp(-tau_t)))
        np.testing.assert_allclose(depth.mean(), want_mean, rtol=0.05)

    def test_empty_segment_zero_weight(self):
        from optix_raytracer_tpu.accel import volume as vol
        slab = uniform_slab((-1, -1, -1), (1, 1, 1))
        o = jnp.asarray([[5.0, 5.0, 5.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        _, w, tau = vol.sample_scatter(slab, o, d, jnp.zeros(1),
                                       jnp.full(1, 100.0), 1.0,
                                       jnp.asarray([0.5]))
        assert float(w[0]) == 0.0 and float(tau[0]) == 0.0


class TestInscatterOcclusion:
    def test_fog_glow_shadowed_by_geometry(self):
        # light above a fog slab; an opaque panel covers HALF the slab.
        # In-scatter under the panel must be darker than the open half —
        # impossible with the old center-sampled, occlusion-free estimator.
        slab = uniform_slab((-2, -0.5, -0.5), (2, 0.5, 0.5))
        panel = np.array([[-2.2, 1.0, -1.2], [0.0, 1.0, -1.2],
                          [0.0, 1.0, 1.2], [-2.2, 1.0, 1.2]], np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        light = ParallelogramLight.make((-0.4, 3.0, -0.4), (0.8, 0, 0),
                                        (0, 0, 0.8), (40.0, 40.0, 40.0))
        scene = make_device_scene(
            panel, idx, np.zeros(2, np.int32),
            [{"kind": mat.DIFFUSE, "base_color": (0.0, 0.0, 0.0)}],
            area_light=light, volume=slab, volume_sigma=0.8,
            volume_albedo=0.9)
        cam = Camera(eye=(0, 0, -5), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y=40.0, aspect=2.0)
        img = render(scene, cam, w=48, h=24, spl=96, depth=1)
        # Camera U = forward x up points toward -x here, so image columns
        # run from world +x (left of frame) to -x: the open half (x > 0)
        # lands in columns ~10-22, the paneled half (x < 0) in ~26-38.
        open_half = img[:, 10:22].mean()
        paneled = img[:, 26:38].mean()
        assert open_half > 1e-3
        assert paneled < 0.6 * open_half, (paneled, open_half)
