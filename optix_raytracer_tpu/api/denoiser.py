"""Denoiser API: the `optixDenoiser*` surface over two backends.

Model kinds (`optix_types.h:1609-1635`): LDR, HDR, AOV, TEMPORAL,
TEMPORAL_AOV, UPSCALE2X, TEMPORAL_UPSCALE2X — all seven reference kinds.
Entry points mirror `optixDenoiserCreate/Setup/Invoke/ComputeIntensity/
ComputeAverageColor` (`optix_host.h:814-1028`) plus the tiled helper
(`optix_denoiser_tiling.h:223`).

Backends: "kpcnn" — the trained kernel-prediction CNN
(denoise/kpcnn.py), the analogue of the reference's pretrained model;
"atrous" — the SVGF-style filter (no weights needed). "auto" picks the
CNN when the shipped checkpoint exists, matching the reference's
behavior of always using the learned model.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..denoise import atrous, flow as flow_mod, kpcnn


def _variance_gate(noisy, filtered, variance, lo: float = 0.05,
                   hi: float = 0.25):
    """Never-worse blend: per-pixel weight from the tracked stderr of the
    progressive mean (`Film.variance_of_mean`). Pixels whose relative
    stderr is below `lo` (converged past the filter's bias floor) keep
    their input EXACTLY; noise above `hi` gets the full filter; a linear
    ramp in between. The L-launch variance estimate is itself noisy, so
    the weight is box-smoothed 3x3 before use."""
    import jax

    def lum(x):
        return (0.2126 * x[..., 0] + 0.7152 * x[..., 1]
                + 0.0722 * x[..., 2])

    stderr = jnp.sqrt(jnp.maximum(lum(variance), 0.0))
    rel = stderr / (lum(noisy) + 1e-2)
    w = jnp.clip((rel - lo) / (hi - lo), 0.0, 1.0)
    # box smooth normalized by the VALID tap count so border pixels are
    # not biased toward "converged"
    box = lambda x: jax.lax.reduce_window(x, 0.0, jax.lax.add, (3, 3),
                                          (1, 1), "SAME")
    w = box(w) / box(jnp.ones_like(w))
    return noisy + w[..., None] * (filtered - noisy)


def _accumulate_history(current, history, alpha: float = 0.7,
                        trust=None):
    """Consistency-gated temporal accumulation (the TEMPORAL model kinds'
    history reuse, `optix_types.h:1609-1635`): clamp the flow-warped
    previous output to the current frame's 3x3 neighborhood range, then
    blend toward it with a weight that falls off as the clamp has to move
    the history (mis-warp / disocclusion ⇒ weight → 0). A converged
    history passes the clamp untouched and dominates the result."""
    import jax

    def window(x, op, init):
        return jax.lax.reduce_window(x, init, op, (3, 3, 1), (1, 1, 1),
                                     "SAME")

    nb_min = window(current, jax.lax.min, jnp.inf)
    nb_max = window(current, jax.lax.max, -jnp.inf)
    clamped = jnp.clip(history, nb_min, nb_max)
    moved = jnp.abs(history - clamped)
    span = jnp.maximum(nb_max - nb_min, 1e-3)
    w = alpha * jnp.clip(1.0 - moved / span, 0.0, 1.0)
    if trust is not None:
        # flowTrustworthiness guide (`optixDenoiser.cpp` -T): per-pixel
        # confidence in the flow scales how much history may blend in.
        t = jnp.asarray(trust, jnp.float32)
        if t.ndim == 3:
            t = t[..., 0]
        w = w * jnp.clip(t, 0.0, 1.0)[..., None]
    return current + w * (clamped - current)


def _warped_history(previous_output, flow, out_hw):
    """Flow-warped history at the output resolution. TEMPORAL_UPSCALE2X
    callers may pass either a full-res previous output (the reference
    contract) or a render-res one (lifted bilinearly first)."""
    import jax
    prev = jnp.asarray(previous_output, jnp.float32)
    if prev.shape[:2] != tuple(out_hw):
        prev = jax.image.resize(prev, tuple(out_hw) + prev.shape[2:],
                                "bilinear")
    return atrous.warp_by_flow(prev, _lift_flow(flow, out_hw))


def _attach_alpha(out, alpha):
    """Re-attach the (possibly denoised) alpha plane, lifting it to the
    output resolution for the upscale kinds."""
    import jax
    if alpha is None:
        return out
    if alpha.shape[:2] != out.shape[:2]:
        alpha = jax.image.resize(alpha, out.shape[:2], "bilinear")
    return jnp.concatenate([out, alpha[..., None]], axis=-1)


def _lift_flow(flow, out_hw):
    """Flow guide at the output resolution: None → zeros; a low-res flow
    is bilinearly lifted with its vectors scaled by the resolution ratio
    (TEMPORAL_UPSCALE2X expects output-res flow, `optix_host.h:892`)."""
    import jax
    h, w = out_hw
    if flow is None:
        return jnp.zeros((h, w, 2), jnp.float32)
    flow = jnp.asarray(flow, jnp.float32)
    fh, fw = flow.shape[:2]
    if (fh, fw) == (h, w):
        return flow
    flow = jax.image.resize(flow, (h, w, 2), "bilinear")
    return flow * jnp.asarray([w / fw, h / fh], jnp.float32)


class ModelKind:
    """The seven reference model kinds (`optix_types.h:1609-1635`); the
    combined kinds compose the temporal history pipeline with AOV
    denoising / 2x upscaling."""
    LDR = "LDR"
    HDR = "HDR"
    AOV = "AOV"
    TEMPORAL = "TEMPORAL"
    TEMPORAL_AOV = "TEMPORAL_AOV"
    UPSCALE2X = "UPSCALE2X"
    TEMPORAL_UPSCALE2X = "TEMPORAL_UPSCALE2X"

    TEMPORAL_KINDS = (TEMPORAL, TEMPORAL_AOV, TEMPORAL_UPSCALE2X)
    UPSCALE_KINDS = (UPSCALE2X, TEMPORAL_UPSCALE2X)
    AOV_KINDS = (AOV, TEMPORAL_AOV)


class AlphaMode:
    """`OptixDenoiserAlphaMode` (`optix_types.h:1640-1643`)."""
    COPY = "COPY"          # alpha passes through untouched
    DENOISE = "DENOISE"    # alpha is filtered like a radiance channel


class Denoiser:
    def __init__(self, context=None, model_kind: str = ModelKind.HDR,
                 guide_albedo: bool = True, guide_normal: bool = True,
                 backend: str = "auto", alpha_mode: str = AlphaMode.COPY):
        self.context = context
        self.model_kind = model_kind
        self.guide_albedo = guide_albedo
        self.guide_normal = guide_normal
        self.alpha_mode = alpha_mode
        if backend == "auto":
            backend = "kpcnn" if kpcnn.has_weights() else "atrous"
        if backend == "kpcnn" and kpcnn.load_params() is None:
            raise ValueError("backend='kpcnn' but no trained checkpoint at "
                             f"{kpcnn.WEIGHTS_PATH} (run "
                             "tools/train_denoiser.py)")
        self.backend = backend
        self._setup = None

    def _spatial(self, work, albedo, normal, iterations, emission=None):
        """One spatial denoise pass through the selected backend."""
        if self.backend == "kpcnn":
            return kpcnn.denoise_kp(kpcnn.load_params(), work,
                                    albedo=albedo, normal=normal,
                                    emission=emission)
        return atrous.denoise(work, albedo=albedo, normal=normal,
                              iterations=iterations)

    def setup(self, width: int, height: int, tiled: bool = False,
              tile: int = 256, overlap: int = 32, iterations: int = 5):
        """optixDenoiserSetup: fix the working resolution/tiling."""
        self._setup = dict(width=width, height=height, tiled=tiled,
                           tile=tile, overlap=overlap, iterations=iterations)
        return self

    def compute_intensity(self, beauty):
        return atrous.compute_intensity(beauty)

    def compute_average_color(self, beauty):
        return atrous.compute_average_color(beauty)

    @staticmethod
    def compute_flow(prev_frame, curr_frame, levels: int = 4):
        """Flow guide layer in invoke()'s convention: curr(p) ≈ prev(p - flow).
        The optixOpticalFlow capability."""
        return -flow_mod.optical_flow(curr_frame, prev_frame, levels=levels)

    def invoke(self, beauty, albedo=None, normal=None, flow=None,
               previous_output=None, intensity=None,
               blend_factor: float = 0.0, aovs: Optional[dict] = None,
               emission=None, variance=None, flow_trust=None):
        """optixDenoiserInvoke. Returns the denoised image (and a dict of
        denoised AOVs in AOV mode).

        HDR mode pre-scales by `intensity` (computed if not given) and
        un-scales after — the reference's HDR pipeline. blend_factor lerps
        toward the noisy input (`OptixDenoiserParams::blendFactor`).

        variance: optional [H, W, 3] per-pixel stderr² of the beauty mean
        (`Film.variance_of_mean()`). When given, a variance-gated blend
        keeps converged pixels at their INPUT value — near-clean renders
        can never come out worse than untouched (the reference's denoiser
        is safe at convergence; this gate gives the same guarantee).
        """
        assert self._setup is not None, "call setup() first (optixDenoiserSetup)"
        it = self._setup["iterations"]
        beauty = jnp.asarray(beauty, jnp.float32)
        if previous_output is not None:
            # a previous invoke() output may carry the re-attached alpha —
            # history blending is RGB-only
            previous_output = jnp.asarray(previous_output,
                                          jnp.float32)[..., :3]
        alpha = None
        if beauty.shape[-1] == 4:
            # OptixDenoiserAlphaMode: COPY passes the input alpha through;
            # DENOISE filters it like a radiance channel (same guides).
            alpha = beauty[..., 3]
            beauty = beauty[..., :3]
            if self.alpha_mode == AlphaMode.DENOISE:
                a3 = jnp.repeat(alpha[..., None], 3, axis=-1)
                alpha = atrous.denoise(
                    a3, albedo=(None if not self.guide_albedo or albedo is None
                                else jnp.asarray(albedo, jnp.float32)[..., :3]),
                    normal=(None if not self.guide_normal or normal is None
                            else jnp.asarray(normal, jnp.float32)[..., :3]),
                    iterations=it)[..., 0]
        if albedo is not None:
            albedo = jnp.asarray(albedo, jnp.float32)[..., :3]
        if normal is not None:
            normal = jnp.asarray(normal, jnp.float32)[..., :3]
        if not self.guide_albedo:
            albedo = None
        if not self.guide_normal:
            normal = None

        temporal = (self.model_kind in ModelKind.TEMPORAL_KINDS
                    and previous_output is not None)
        upscale = self.model_kind in ModelKind.UPSCALE_KINDS
        scale = 1.0
        if self.model_kind in (ModelKind.HDR, ModelKind.TEMPORAL,
                               ModelKind.TEMPORAL_AOV, ModelKind.UPSCALE2X,
                               ModelKind.TEMPORAL_UPSCALE2X) \
                and self.backend != "kpcnn":
            # The KPCNN is trained on RAW HDR radiance (tools/
            # train_denoiser.py, log1p loss) — pre-scaling shifts its
            # input off the training distribution and measurably degrades
            # output, so intensity normalization applies to the filter
            # backends only.
            scale = intensity if intensity is not None \
                else self.compute_intensity(beauty)
        work = beauty * scale

        if upscale and self.backend == "kpcnn":
            up_params = kpcnn.load_params(kpcnn.UPSCALE_WEIGHTS_PATH)
            if up_params is not None:
                # Trained upscaler path: denoise + 2x-lift in ONE net —
                # guide layers are FULL-RES (2H, 2W) steering the lifted
                # low-res radiance; the plain spatial pass is skipped
                # (its guides would shape-mismatch anyway).
                out = kpcnn.upscale2x_kp(
                    up_params, jnp.asarray(beauty, jnp.float32),
                    albedo=None if albedo is None else jnp.asarray(albedo),
                    normal=None if normal is None else jnp.asarray(normal),
                    emission=(None if emission is None
                              else jnp.asarray(emission, jnp.float32)))
                if temporal:
                    # TEMPORAL_UPSCALE2X: history is the previous FULL-RES
                    # output; a low-res flow is lifted (and doubled) to
                    # output resolution before the warp.
                    out = _accumulate_history(
                        out, _warped_history(
                            previous_output, flow, out.shape[:2]),
                        trust=flow_trust)
                return _attach_alpha(out, alpha)

        core = None
        if self.backend == "kpcnn":
            # emission guide (render_aovs "emission"): noise-free emitter
            # radiance bypasses the kernel filter entirely.
            em = None if emission is None else jnp.asarray(emission,
                                                           jnp.float32)
            core = (lambda b, a, n:
                    kpcnn.denoise_kp(kpcnn.load_params(), b, a, n,
                                     emission=em))

        if temporal and not upscale:
            if flow is None:
                flow = jnp.zeros(beauty.shape[:2] + (2,), jnp.float32)
            tparams = (kpcnn.load_params(kpcnn.TEMPORAL_WEIGHTS_PATH)
                       if self.backend == "kpcnn" else None)
            if tparams is not None:
                # trained temporal model: the flow-reprojected previous
                # output rides in as 3 extra input channels — the net
                # learns history reuse instead of a fixed-alpha blend.
                # (scale == 1.0 on the kpcnn backend, so falling through
                # to the common epilogue is exact.)
                history = atrous.warp_by_flow(
                    jnp.asarray(previous_output, jnp.float32),
                    jnp.asarray(flow, jnp.float32))
                out = kpcnn.denoise_kp(
                    tparams, jnp.asarray(beauty, jnp.float32),
                    albedo=albedo, normal=normal,
                    emission=(None if emission is None
                              else jnp.asarray(emission, jnp.float32)),
                    history=history)
                # Temporal ACCUMULATION on top of the net: 26-channel
                # weights blend a learned per-pixel alpha in-net
                # (kpcnn.denoise_kp), but the training histories are
                # realistic (noisy, reprojected), so the learned alpha is
                # conservative; the consistency-gated clamp blend below
                # additionally exploits CONVERGED histories, which only
                # exist at inference. Both are anti-ghosting-safe.
                out = _accumulate_history(out, history,
                                           trust=flow_trust)
            else:
                out = atrous.denoise_temporal(
                    work, jnp.asarray(previous_output) * scale,
                    flow, albedo=albedo, normal=normal,
                    iterations=it, core=core)
        elif self._setup["tiled"]:
            out = jnp.asarray(atrous.denoise_tiled(
                work, albedo=albedo, normal=normal,
                tile=self._setup["tile"], overlap=self._setup["overlap"],
                iterations=it, core=core))
        else:
            em = None if emission is None else jnp.asarray(emission,
                                                           jnp.float32)
            out = self._spatial(work, albedo, normal, it, emission=em)

        out = out / scale
        if variance is not None:
            out = _variance_gate(beauty, out,
                                 jnp.asarray(variance, jnp.float32))
        if blend_factor > 0.0:
            out = (1.0 - blend_factor) * out + blend_factor * beauty

        if upscale:
            out = jnp.asarray(out)
            out = jnp.repeat(jnp.repeat(out, 2, 0), 2, 1)
            # soften the nearest-neighbor blocks
            out = 0.25 * (out + jnp.roll(out, 1, 0) + jnp.roll(out, 1, 1)
                          + jnp.roll(out, (1, 1), (0, 1)))
            if temporal:
                out = _accumulate_history(
                    out, _warped_history(previous_output, flow,
                                         out.shape[:2]),
                    trust=flow_trust)

        out = _attach_alpha(out, alpha)
        if self.model_kind in ModelKind.AOV_KINDS and aovs:
            den_aovs = {k: self._spatial(jnp.asarray(v) * scale,
                                         albedo, normal, it) / scale
                        for k, v in aovs.items()}
            return out, den_aovs
        return out
