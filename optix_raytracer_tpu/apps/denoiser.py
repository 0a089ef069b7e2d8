"""optixDenoiser equivalent: standalone denoiser driver.

Reference: `SDK/optixDenoiser/optixDenoiser.cpp` — beauty (+albedo/normal/
flow) in → denoised image out, with HDR/AOV/temporal/tiled modes, frame
SEQUENCES (`--Frames first-last` with a run of '+' characters in filenames
replaced by the zero-padded frame number, `optixDenoiser.cpp:59,75-103`),
-e exposure, and -z flow-apply-only. Float layers travel as .exr
(half-float scanline files via the from-scratch codec in io/exr.py,
matching the reference's tinyexr file contract); .npz remains a fallback.
"""
from __future__ import annotations

import argparse
import re

import numpy as np

from ..api.denoiser import Denoiser, ModelKind
from ..io.image import load_image, save_image


def frame_filename(name: str, frame: int) -> str:
    """First run of '+' characters → zero-padded frame number
    (getFrameFilename, `optixDenoiser.cpp:75-103`); no '+' → unchanged."""
    if frame < 0:
        return name
    m = re.search(r"\++", name)
    if m is None:
        return name
    width = m.end() - m.start()
    fn = str(frame)
    if len(fn) > width:
        raise ValueError(
            f"frame number {frame} needs {len(fn)} digits but the '+' "
            f"placeholder in {name!r} is {width} wide")
    return name[:m.start()] + fn.zfill(width) + name[m.end():]


def _load(path):
    if path is None:
        return None
    r = load_image(path)
    a = np.asarray(r, np.float32)[..., :3]
    return a / 255.0 if r.dtype == np.uint8 else a


def main(argv=None):
    p = argparse.ArgumentParser(
        description="standalone denoiser (optixDenoiser)")
    p.add_argument("input", help="noisy beauty image (.exr/.npz float or "
                                 ".png); '+' run = frame placeholder")
    p.add_argument("-o", "--out", default="denoised.exr")
    p.add_argument("-a", "--albedo", default=None)
    p.add_argument("-n", "--normal", default=None)
    p.add_argument("-F", "--flow", default=None, help="flow layer (temporal)")
    p.add_argument("-p", "--prev", default=None,
                   help="previous output (temporal)")
    p.add_argument("-A", "--AOV", action="append", default=[],
                   dest="aovs", help="AOV layer to co-denoise (repeatable)")
    p.add_argument("-S", action="append", default=[], dest="spec_aovs",
                   help="specular AOV layer (co-denoised like -A)")
    p.add_argument("-T", default=None, dest="flow_trust",
                   help="flowTrustworthiness layer (temporal confidence)")
    p.add_argument("--Frames", default=None, metavar="FIRST-LAST",
                   help="frame sequence: '+' runs in filenames take the "
                        "frame number; each frame's output feeds the next "
                        "as temporal history")
    p.add_argument("-e", "--exposure", type=float, default=0.0,
                   help="stops of exposure applied to the output")
    p.add_argument("-z", action="store_true", dest="flow_only",
                   help="apply flow to the input (no denoising) and write")
    p.add_argument("-t", "--tile", type=int, default=0, help="tile size (0=off)")
    p.add_argument("-b", "--blend", type=float, default=0.0)
    p.add_argument("-i", "--iterations", type=int, default=5)
    p.add_argument("--ldr", action="store_true")
    p.add_argument("--upscale", action="store_true", help="2x upscale model")
    args = p.parse_args(argv)

    if args.Frames:
        first, last = (int(x) for x in args.Frames.split("-"))
        frames = list(range(first, last + 1))
        if len(frames) > 1 and re.search(r"\++", args.out) is None:
            raise SystemExit(
                f"--Frames {args.Frames} with -o {args.out!r}: the output "
                "name needs a '+' frame placeholder, or every frame would "
                "overwrite the same file")
    else:
        frames = [-1]

    prev = _load(frame_filename(args.prev, frames[0])
                 if args.prev else None)
    for frame in frames:
        raw = load_image(frame_filename(args.input, frame))
        beauty = np.asarray(raw, np.float32)
        if raw.dtype == np.uint8:
            beauty = beauty / 255.0   # LDR display image → [0,1]
        beauty = beauty[..., :3]
        albedo = _load(frame_filename(args.albedo, frame)
                       if args.albedo else None)
        normal = _load(frame_filename(args.normal, frame)
                       if args.normal else None)
        fl = (None if args.flow is None
              else np.asarray(load_image(frame_filename(args.flow, frame))))
        aov_imgs = {path: _load(frame_filename(path, frame))
                    for path in args.aovs + args.spec_aovs}
        trust = (_load(frame_filename(args.flow_trust, frame))
                 if args.flow_trust else None)

        if args.flow_only:
            # -z: warp the input by the flow and write it — the
            # reference's flow-inspection mode (no denoising).
            from ..denoise.atrous import warp_by_flow
            if fl is None:
                fl = np.zeros(beauty.shape[:2] + (2,), np.float32)
            out = np.asarray(warp_by_flow(beauty, fl))
            kind = "FLOW_APPLY"
        else:
            temporal = prev is not None
            if args.upscale:
                kind = (ModelKind.TEMPORAL_UPSCALE2X if temporal
                        else ModelKind.UPSCALE2X)
            elif aov_imgs:
                kind = (ModelKind.TEMPORAL_AOV if temporal
                        else ModelKind.AOV)
            elif temporal:
                kind = ModelKind.TEMPORAL
            else:
                kind = ModelKind.LDR if args.ldr else ModelKind.HDR
            den = Denoiser(model_kind=kind, guide_albedo=albedo is not None,
                           guide_normal=normal is not None)
            den.setup(beauty.shape[1], beauty.shape[0], tiled=args.tile > 0,
                      tile=args.tile or 256, iterations=args.iterations)
            res = den.invoke(beauty, albedo=albedo, normal=normal, flow=fl,
                             previous_output=prev, blend_factor=args.blend,
                             aovs=aov_imgs or None, flow_trust=trust)
            den_aovs = {}
            if isinstance(res, tuple):
                res, den_aovs = res
            out = np.asarray(res)
            prev = out                    # feeds the next frame's history
            import os
            for idx, (path, img) in enumerate(den_aovs.items()):
                d, base = os.path.split(args.out)
                n_aov = len(args.aovs) + len(args.spec_aovs)
                tag = "aov" if n_aov == 1 else f"aov{idx}"
                aov_out = frame_filename(
                    os.path.join(d, f"{tag}_{base}"), frame)
                save_image(aov_out, np.asarray(img) * 2.0 ** args.exposure)

        out_name = frame_filename(args.out, frame)
        save_image(out_name, out * np.float32(2.0 ** args.exposure))
        print(f"wrote {out_name} {out.shape} ({kind})")


if __name__ == "__main__":
    main()
