"""Denoiser quality/semantics + optical flow + the API wrapper."""
import jax.numpy as jnp
import numpy as np
import pytest

from optix_raytracer_tpu.api.denoiser import Denoiser, ModelKind
from optix_raytracer_tpu.denoise import atrous, flow


def make_noisy_scene(rng, h=64, w=64, sigma=0.3):
    """Piecewise-constant 'render' + albedo/normal guides + noise."""
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = (1.0, 0.3, 0.2)
    clean[:, w // 2:] = (0.2, 0.6, 1.2)
    clean[h // 3: 2 * h // 3, w // 4: 3 * w // 4] *= 0.4
    albedo = np.where(clean > 0.5, 0.9, 0.4).astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    normal[h // 2:, :, 1] = 0.8
    normal[h // 2:, :, 2] = 0.6
    noisy = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    return clean, np.maximum(noisy, 0), albedo, normal


class TestAtrous:
    def test_reduces_noise(self):
        rng = np.random.default_rng(0)
        clean, noisy, albedo, normal = make_noisy_scene(rng)
        out = np.asarray(atrous.denoise(noisy, albedo=albedo, normal=normal))
        err_in = np.abs(noisy - clean).mean()
        err_out = np.abs(out - clean).mean()
        assert err_out < 0.4 * err_in, (err_in, err_out)

    def test_edges_preserved(self):
        rng = np.random.default_rng(1)
        clean, noisy, albedo, normal = make_noisy_scene(rng, sigma=0.2)
        out = np.asarray(atrous.denoise(noisy, albedo=albedo, normal=normal))
        w = clean.shape[1]
        # the vertical material edge must survive: left/right means differ
        left = out[:, : w // 2 - 4].mean(axis=(0, 1))
        right = out[:, w // 2 + 4:].mean(axis=(0, 1))
        assert abs(left - right).max() > 0.2

    def test_tiled_matches_untiled_interior(self):
        rng = np.random.default_rng(2)
        _, noisy, albedo, normal = make_noisy_scene(rng, h=96, w=96)
        full = np.asarray(atrous.denoise(noisy, albedo=albedo, normal=normal,
                                         iterations=3))
        tiled = atrous.denoise_tiled(noisy, albedo=albedo, normal=normal,
                                     tile=48, overlap=24, iterations=3)
        # interiors agree (borders differ by wrap vs overlap handling)
        diff = np.abs(full[24:-24, 24:-24] - tiled[24:-24, 24:-24])
        assert diff.mean() < 0.02

    def test_intensity_and_average(self):
        img = np.full((8, 8, 3), 2.0, np.float32)
        inten = float(atrous.compute_intensity(img))
        assert inten == pytest.approx(0.5, rel=1e-3)
        np.testing.assert_allclose(atrous.compute_average_color(img), 2.0)


class TestFlow:
    def test_recovers_translation(self):
        rng = np.random.default_rng(3)
        base = rng.uniform(0, 1, (64, 64)).astype(np.float32)
        # smooth it so block matching has gradients
        for _ in range(2):
            base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                           + np.roll(base, 1, 1) + np.roll(base, -1, 1))
        shift = (3, 5)  # (dy, dx)
        moved = np.roll(base, shift, axis=(0, 1))
        f = np.asarray(flow.optical_flow(base, moved, levels=3, radius=2))
        # a(p) ≈ b(p + flow): the flow should be ≈ -(dx, dy)... sign checked
        # empirically by median over the interior
        med = np.median(f[16:-16, 16:-16], axis=(0, 1))
        assert abs(abs(med[0]) - shift[1]) <= 1.0
        assert abs(abs(med[1]) - shift[0]) <= 1.0


class TestDenoiserApi:
    def test_hdr_invoke(self):
        rng = np.random.default_rng(4)
        clean, noisy, albedo, normal = make_noisy_scene(rng)
        den = Denoiser(model_kind=ModelKind.HDR).setup(64, 64)
        out = np.asarray(den.invoke(noisy, albedo=albedo, normal=normal))
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()

    def test_temporal_invoke(self):
        rng = np.random.default_rng(5)
        clean, noisy, albedo, normal = make_noisy_scene(rng)
        den = Denoiser(model_kind=ModelKind.TEMPORAL).setup(64, 64)
        prev = clean  # perfect history
        zero_flow = np.zeros((64, 64, 2), np.float32)
        out = np.asarray(den.invoke(noisy, albedo=albedo, normal=normal,
                                    flow=zero_flow, previous_output=prev))
        # with clean history the temporal result beats pure spatial
        spatial = np.asarray(
            Denoiser(model_kind=ModelKind.HDR).setup(64, 64).invoke(
                noisy, albedo=albedo, normal=normal))
        assert (np.abs(out - clean).mean()
                < np.abs(spatial - clean).mean() + 1e-6)

    def test_upscale2x_shape(self):
        rng = np.random.default_rng(6)
        _, noisy, _, _ = make_noisy_scene(rng, h=32, w=32)
        den = Denoiser(model_kind=ModelKind.UPSCALE2X,
                       guide_albedo=False, guide_normal=False).setup(32, 32)
        out = np.asarray(den.invoke(noisy))
        assert out.shape == (64, 64, 3)

    def test_aov_mode(self):
        rng = np.random.default_rng(7)
        _, noisy, albedo, normal = make_noisy_scene(rng, h=32, w=32)
        den = Denoiser(model_kind=ModelKind.AOV).setup(32, 32)
        out, aovs = den.invoke(noisy, albedo=albedo, normal=normal,
                               aovs={"glossy": noisy * 0.5})
        assert "glossy" in aovs and np.asarray(aovs["glossy"]).shape == noisy.shape

    def test_temporal_aov_mode(self):
        """TEMPORAL_AOV (`optix_types.h` 0x2326): temporal history on the
        beauty + denoised AOV dict in one invoke."""
        rng = np.random.default_rng(9)
        clean, noisy, albedo, normal = make_noisy_scene(rng, h=32, w=32)
        den = Denoiser(model_kind=ModelKind.TEMPORAL_AOV).setup(32, 32)
        out, aovs = den.invoke(
            noisy, albedo=albedo, normal=normal,
            flow=np.zeros((32, 32, 2), np.float32), previous_output=clean,
            aovs={"glossy": noisy * 0.5})
        assert "glossy" in aovs
        # converged history pulls the result well below plain spatial
        spatial, _ = Denoiser(model_kind=ModelKind.AOV).setup(32, 32).invoke(
            noisy, albedo=albedo, normal=normal, aovs={"glossy": noisy})
        assert (np.abs(np.asarray(out) - clean).mean()
                < 0.7 * np.abs(np.asarray(spatial) - clean).mean())

    def test_temporal_upscale2x(self):
        """TEMPORAL_UPSCALE2X (0x2328): 2x output blended toward the
        flow-warped previous FULL-RES output."""
        rng = np.random.default_rng(10)
        clean, noisy, albedo, normal = make_noisy_scene(rng, h=32, w=32)
        clean_hi = np.repeat(np.repeat(clean, 2, 0), 2, 1)
        den = Denoiser(model_kind=ModelKind.TEMPORAL_UPSCALE2X,
                       guide_albedo=False, guide_normal=False).setup(32, 32)
        out = np.asarray(den.invoke(
            noisy, flow=np.zeros((32, 32, 2), np.float32),
            previous_output=clean_hi))
        assert out.shape == (64, 64, 3)
        plain = np.asarray(Denoiser(
            model_kind=ModelKind.UPSCALE2X, guide_albedo=False,
            guide_normal=False).setup(32, 32).invoke(noisy))
        assert (np.abs(out - clean_hi).mean()
                < np.abs(plain - clean_hi).mean())

    def test_blend_factor(self):
        rng = np.random.default_rng(8)
        _, noisy, albedo, normal = make_noisy_scene(rng, h=32, w=32)
        den = Denoiser().setup(32, 32)
        full = np.asarray(den.invoke(noisy, albedo=albedo, normal=normal))
        blended = np.asarray(den.invoke(noisy, albedo=albedo, normal=normal,
                                        blend_factor=1.0))
        np.testing.assert_allclose(blended, noisy, atol=1e-5)
        assert np.abs(full - noisy).mean() > 1e-3


class TestUpscale2x:
    def test_upscale_kp_shapes_and_energy(self):
        # random weights: plumbing only (2x shape, finite, guide use)
        import jax
        from optix_raytracer_tpu.denoise import kpcnn
        rng = np.random.default_rng(0)
        params = kpcnn.init_params(jax.random.PRNGKey(0))
        lr = jnp.asarray(rng.uniform(0, 2, (32, 40, 3)).astype(np.float32))
        alb = jnp.asarray(rng.uniform(0.2, 1, (64, 80, 3)).astype(np.float32))
        nrm = jnp.asarray(rng.normal(size=(64, 80, 3)).astype(np.float32))
        out = kpcnn.upscale2x_kp(params, lr, albedo=alb, normal=nrm)
        assert out.shape == (64, 80, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_upsample2x_bilinear_constant(self):
        from optix_raytracer_tpu.denoise.kpcnn import upsample2x_bilinear
        img = jnp.full((8, 8, 3), 0.7, jnp.float32)
        up = upsample2x_bilinear(img)
        assert up.shape == (16, 16, 3)
        np.testing.assert_allclose(np.asarray(up), 0.7, atol=1e-6)

    def test_api_upscale_with_trained_weights(self):
        from optix_raytracer_tpu.denoise import kpcnn
        if not kpcnn.has_upscale_weights():
            pytest.skip("upscale weights not trained yet")
        from optix_raytracer_tpu.api.denoiser import Denoiser, ModelKind
        rng = np.random.default_rng(1)
        lr = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        alb = jnp.asarray(rng.uniform(0.2, 1, (64, 64, 3)).astype(np.float32))
        nrm = jnp.zeros((64, 64, 3), jnp.float32)
        d = Denoiser(model_kind=ModelKind.UPSCALE2X, backend="kpcnn",
                     guide_albedo=True, guide_normal=True)
        d.setup(32, 32)
        out = d.invoke(lr, albedo=alb, normal=nrm)
        assert out.shape == (64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestTemporalKP:
    def test_temporal_net_plumbing(self):
        # 13-channel net with a history input: shapes + finiteness + the
        # history channel actually influences the output
        import jax
        from optix_raytracer_tpu.denoise import kpcnn
        rng = np.random.default_rng(2)
        params = kpcnn.init_params(jax.random.PRNGKey(1), cin=13)
        noisy = jnp.asarray(rng.uniform(0, 2, (32, 32, 3)).astype(np.float32))
        alb = jnp.asarray(rng.uniform(0.2, 1, (32, 32, 3)).astype(np.float32))
        nrm = jnp.zeros((32, 32, 3), jnp.float32)
        h0 = jnp.zeros((32, 32, 3), jnp.float32)
        h1 = jnp.asarray(rng.uniform(0, 2, (32, 32, 3)).astype(np.float32))
        o0 = kpcnn.denoise_kp(params, noisy, alb, nrm, history=h0)
        o1 = kpcnn.denoise_kp(params, noisy, alb, nrm, history=h1)
        assert o0.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(o0)).all()
        assert float(jnp.abs(o0 - o1).max()) > 0.0

    def test_api_temporal_with_trained_weights(self):
        from optix_raytracer_tpu.denoise import kpcnn
        if not kpcnn.has_temporal_weights():
            pytest.skip("temporal weights not trained yet")
        from optix_raytracer_tpu.api.denoiser import Denoiser, ModelKind
        rng = np.random.default_rng(3)
        cur = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        prev = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        fl = jnp.zeros((32, 32, 2), jnp.float32)
        d = Denoiser(model_kind=ModelKind.TEMPORAL, backend="kpcnn",
                     guide_albedo=True, guide_normal=True)
        d.setup(32, 32)
        out = d.invoke(cur, albedo=jnp.ones_like(cur),
                       normal=jnp.zeros_like(cur),
                       previous_output=prev, flow=fl)
        assert out.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestNeverWorse:
    """Variance-gated blend (Film.variance_of_mean + Denoiser(variance=)):
    near-clean renders must come out no worse than untouched — the
    reference's denoiser is safe at convergence."""

    def _render_tracked(self, spp, launches, w=48, h=48):
        from optix_raytracer_tpu.core.film import Film
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        from optix_raytracer_tpu.wavefront.engine import render_accumulate
        scene = cornell_box()
        cam = cornell_camera(w, h).params()
        film = Film.create(h, w, track_variance=True)
        per = spp // launches
        for _ in range(launches):
            film, _ = render_accumulate(scene, cam, film, w, h,
                                        samples_per_launch=per, max_depth=4,
                                        chunk_size=None, impl="xla")
        return scene, cam, film

    def test_variance_tracks_and_decays(self):
        _, _, f64 = self._render_tracked(16, 8)
        v16 = np.asarray(f64.variance_of_mean())
        assert v16.shape == f64.accum.shape and (v16 >= 0).all()
        _, _, f256 = self._render_tracked(64, 8)
        v64 = np.asarray(f256.variance_of_mean())
        # 4x the samples -> ~4x lower stderr^2 of the mean (allow slack)
        assert v64.mean() < 0.5 * v16.mean(), (v16.mean(), v64.mean())

    # Gate quality tests run at 128x128 — the KPCNN's training resolution
    # regime (256-res scenes, 128 patches); quality comparisons are in the
    # repo's training metric, log-MSE. Renders are cached per module run.
    _CACHE = {}

    def _gated(self, spp, launches, w=128, h=128):
        key = (spp, launches, w, h)
        if key not in self._CACHE:
            from optix_raytracer_tpu.wavefront.engine import render_aovs
            scene, cam, film = self._render_tracked(spp, launches, w, h)
            if "clean" not in self._CACHE:
                _, _, cf = self._render_tracked(512, 8, w, h)
                self._CACHE["clean"] = np.asarray(cf.accum)
                self._CACHE["aovs"] = render_aovs(scene, cam, w, h)
            aovs = self._CACHE["aovs"]
            den = Denoiser(model_kind=ModelKind.HDR).setup(w, h)
            out = np.asarray(den.invoke(
                film.accum, albedo=aovs["albedo"], normal=aovs["normal"],
                emission=aovs.get("emission"),
                variance=film.variance_of_mean()))
            self._CACHE[key] = (np.asarray(film.accum), out)
        noisy, out = self._CACHE[key]
        clean = self._CACHE["clean"]

        def lmse(x):
            return float(np.mean((np.log1p(np.maximum(x, 0.0))
                                  - np.log1p(np.maximum(clean, 0.0))) ** 2))
        return lmse(noisy), lmse(out)

    def test_cornell_64spp_not_worse(self):
        """The VERDICT acceptance: at 64 spp on the canonical Cornell the
        gated denoiser must not regress past the untouched input (the
        ungated KPCNN's residual floor is ~10x the 64-spp noise here)."""
        noisy, out = self._gated(64, 16)
        assert out <= noisy * 1.001, (out, noisy)

    def test_gate_open_when_noisy(self):
        """At 4 spp the gate must stay open: gated output still beats the
        noisy input clearly (the gate is a safety, not a lobotomy)."""
        noisy, out = self._gated(4, 4)
        assert out < 0.8 * noisy, (out, noisy)

    def test_checkpoint_roundtrip_variance(self, tmp_path):
        from optix_raytracer_tpu.core import checkpoint as ckpt
        from optix_raytracer_tpu.core.film import Film
        film = Film.create(8, 8, track_variance=True)
        film = film.accumulate(jnp.ones((8, 8, 3)))
        film = film.accumulate(jnp.full((8, 8, 3), 2.0))
        p = str(tmp_path / "f.npz")
        ckpt.save_checkpoint(p, film)
        f2, _, _ = ckpt.load_checkpoint(p)
        np.testing.assert_allclose(np.asarray(f2.sq), np.asarray(film.sq))
        assert int(f2.launches) == 2
        np.testing.assert_allclose(
            np.asarray(f2.variance_of_mean()),
            np.asarray(film.variance_of_mean()))


class TestTemporalSequence:
    """VERDICT acceptance for the trained TEMPORAL model: on a moving-
    camera Cornell sequence the trained temporal net must beat the
    flow-blended per-frame model (the pre-trained-temporal fallback)."""

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_moving_camera_cornell(self):
        from optix_raytracer_tpu.denoise import kpcnn
        if not kpcnn.has_temporal_weights():
            pytest.skip("temporal weights not trained yet")
        from optix_raytracer_tpu.core.camera import Camera
        from optix_raytracer_tpu.core.film import Film
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        from optix_raytracer_tpu.wavefront.engine import (render_accumulate,
                                                          render_aovs)
        w = h = 128
        scene = cornell_box()
        cam_prev = Camera(eye=(290.0, 280.0, -900.0),
                          lookat=(278.0, 273.0, 330.0), up=(0, 1, 0),
                          fov_y=35.0, aspect=1.0).params()
        cam_cur = cornell_camera(w, h).params()

        def render(cam, spp, launches):
            f = Film.create(h, w)
            for _ in range(launches):
                f, _ = render_accumulate(scene, cam, f, w, h,
                                         samples_per_launch=spp // launches,
                                         max_depth=4, chunk_size=None,
                                         impl="xla")
            return np.asarray(f.accum)

        prev = render(cam_prev, 64, 4)       # previous frame's output
        noisy = render(cam_cur, 4, 4)
        clean = render(cam_cur, 256, 4)
        aovs = render_aovs(scene, cam_cur, w, h)

        flow = Denoiser.compute_flow(jnp.asarray(prev), jnp.asarray(noisy))
        kw = dict(albedo=aovs["albedo"], normal=aovs["normal"],
                  emission=aovs.get("emission"), flow=flow,
                  previous_output=prev)
        d_t = Denoiser(model_kind=ModelKind.TEMPORAL,
                       backend="kpcnn").setup(w, h)
        out_t = np.asarray(d_t.invoke(jnp.asarray(noisy), **kw))
        d_f = Denoiser(model_kind=ModelKind.TEMPORAL,
                       backend="atrous").setup(w, h)
        out_f = np.asarray(d_f.invoke(jnp.asarray(noisy), **kw))

        def lmse(x):
            return float(np.mean((np.log1p(np.maximum(x, 0))
                                  - np.log1p(np.maximum(clean, 0))) ** 2))
        noisy_e, t_e, f_e = lmse(noisy), lmse(out_t), lmse(out_f)
        assert t_e < f_e, (t_e, f_e)
        assert t_e < 0.5 * noisy_e, (t_e, noisy_e)


class TestAlphaModes:
    """OptixDenoiserAlphaMode (`optix_types.h:1640-1643`): COPY passes the
    input alpha through bit-exactly; DENOISE filters it."""

    def test_copy_and_denoise(self):
        from optix_raytracer_tpu.api.denoiser import AlphaMode
        rng = np.random.default_rng(12)
        clean, noisy, albedo, normal = make_noisy_scene(rng, h=32, w=32)
        a_clean = np.zeros((32, 32), np.float32)
        a_clean[:, 16:] = 1.0
        a_noisy = (a_clean + rng.normal(0, 0.15, (32, 32))).astype(np.float32)
        rgba = np.concatenate([noisy, a_noisy[..., None].astype(np.float32)],
                              axis=-1)
        d_copy = Denoiser(alpha_mode=AlphaMode.COPY).setup(32, 32)
        out = np.asarray(d_copy.invoke(rgba, albedo=albedo, normal=normal))
        assert out.shape == (32, 32, 4)
        np.testing.assert_array_equal(out[..., 3], rgba[..., 3])
        d_dn = Denoiser(alpha_mode=AlphaMode.DENOISE).setup(32, 32)
        out2 = np.asarray(d_dn.invoke(rgba, albedo=albedo, normal=normal))
        assert (np.abs(out2[..., 3] - a_clean).mean()
                < np.abs(a_noisy - a_clean).mean())

    def test_alpha_through_upscale(self):
        from optix_raytracer_tpu.api.denoiser import AlphaMode
        rng = np.random.default_rng(13)
        _, noisy, _, _ = make_noisy_scene(rng, h=16, w=16)
        rgba = np.concatenate(
            [noisy, np.ones((16, 16, 1), np.float32)], axis=-1)
        den = Denoiser(model_kind=ModelKind.UPSCALE2X, guide_albedo=False,
                       guide_normal=False,
                       alpha_mode=AlphaMode.COPY).setup(16, 16)
        out = np.asarray(den.invoke(rgba))
        assert out.shape == (32, 32, 4)
        np.testing.assert_allclose(out[..., 3], 1.0, atol=1e-5)

    def test_temporal_feedback_with_alpha(self):
        """A previous invoke() output (which may carry the re-attached
        alpha) must feed back as temporal history without shape errors."""
        from optix_raytracer_tpu.api.denoiser import AlphaMode
        rng = np.random.default_rng(14)
        clean, noisy, albedo, normal = make_noisy_scene(rng, h=32, w=32)
        rgba = np.concatenate(
            [noisy, np.ones((32, 32, 1), np.float32)], axis=-1)
        den = Denoiser(model_kind=ModelKind.TEMPORAL,
                       alpha_mode=AlphaMode.COPY).setup(32, 32)
        prev = den.invoke(rgba, albedo=albedo, normal=normal)
        assert np.asarray(prev).shape == (32, 32, 4)
        out = den.invoke(rgba, albedo=albedo, normal=normal,
                         flow=np.zeros((32, 32, 2), np.float32),
                         previous_output=prev)
        assert np.asarray(out).shape == (32, 32, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestOpticalFlowApp:
    """optixOpticalFlow CLI contract: frames in → 3-channel flow EXR out
    (flow in channels 0-1, channel 2 zero — optixOpticalFlow.cpp:205-209)."""

    def _frames(self, tmp_path, dx=3, dy=-2):
        from optix_raytracer_tpu.io.exr import write_exr
        rng = np.random.default_rng(11)
        a = rng.uniform(0.0, 1.0, (48, 64, 3)).astype(np.float32)
        b = np.roll(a, (dy, dx), axis=(0, 1))
        pa, pb = str(tmp_path / "f0.exr"), str(tmp_path / "f1.exr")
        write_exr(pa, a)
        write_exr(pb, b)
        return pa, pb

    def test_two_frames(self, tmp_path):
        from optix_raytracer_tpu.apps import optical_flow as app
        from optix_raytracer_tpu.io.exr import read_exr
        pa, pb = self._frames(tmp_path)
        out = str(tmp_path / "flow.exr")
        app.main([pa, pb, "-o", out])
        fl = np.asarray(read_exr(out))
        assert fl.shape == (48, 64, 3)
        assert np.all(fl[..., 2] == 0.0)
        # interior flow recovers the dominant (dx, dy) = (3, -2) shift
        inner = fl[12:36, 16:48]
        assert abs(np.median(inner[..., 0]) - 3.0) <= 1.0
        assert abs(np.median(inner[..., 1]) - (-2.0)) <= 1.0

    def test_frame_sequence(self, tmp_path):
        from optix_raytracer_tpu.apps import optical_flow as app
        from optix_raytracer_tpu.io.exr import read_exr, write_exr
        rng = np.random.default_rng(5)
        a = rng.uniform(0.0, 1.0, (32, 32, 3)).astype(np.float32)
        for i in range(3):
            write_exr(str(tmp_path / f"f-{i:02d}.exr"),
                      np.roll(a, i * 2, axis=1))
        out_pat = str(tmp_path / "flow-++.exr")
        app.main([str(tmp_path / "f-++.exr"), "-o", out_pat,
                  "--Frames", "0-2"])
        for i in range(2):
            fl = np.asarray(read_exr(str(tmp_path / f"flow-{i:02d}.exr")))
            assert fl.shape == (32, 32, 3)
            assert np.isfinite(fl).all()

    def test_size_mismatch_rejected(self, tmp_path):
        from optix_raytracer_tpu.apps import optical_flow as app
        from optix_raytracer_tpu.io.exr import write_exr
        pa = str(tmp_path / "a.exr")
        pb = str(tmp_path / "b.exr")
        write_exr(pa, np.zeros((16, 16, 3), np.float32))
        write_exr(pb, np.zeros((16, 24, 3), np.float32))
        with pytest.raises(SystemExit):
            app.main([pa, pb, "-o", str(tmp_path / "o.exr")])
