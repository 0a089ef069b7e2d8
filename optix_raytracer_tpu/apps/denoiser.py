"""optixDenoiser equivalent: standalone denoiser driver.

Reference: `SDK/optixDenoiser/optixDenoiser.cpp` — beauty (+albedo/normal/
flow) in → denoised image out, with HDR/AOV/temporal/tiled modes and -e
exposure. Float layers travel as .exr (half-float scanline files via the
from-scratch codec in io/exr.py, matching the reference's tinyexr file
contract, `optixDenoiser.cpp:51-104`); .npz remains as a fallback.
"""
from __future__ import annotations

import argparse

import numpy as np

from ..api.denoiser import Denoiser, ModelKind
from ..io.image import load_image, save_image


def main(argv=None):
    p = argparse.ArgumentParser(description="standalone denoiser (optixDenoiser)")
    p.add_argument("input", help="noisy beauty image (.exr/.npz float or .png)")
    p.add_argument("-o", "--out", default="denoised.exr")
    p.add_argument("-a", "--albedo", default=None)
    p.add_argument("-n", "--normal", default=None)
    p.add_argument("-F", "--flow", default=None, help="flow .npz (temporal)")
    p.add_argument("-p", "--prev", default=None, help="previous output (temporal)")
    p.add_argument("-t", "--tile", type=int, default=0, help="tile size (0=off)")
    p.add_argument("-b", "--blend", type=float, default=0.0)
    p.add_argument("-i", "--iterations", type=int, default=5)
    p.add_argument("--ldr", action="store_true")
    p.add_argument("--upscale", action="store_true", help="2x upscale model")
    args = p.parse_args(argv)

    raw = load_image(args.input)
    beauty = np.asarray(raw, np.float32)
    if raw.dtype == np.uint8:
        beauty = beauty / 255.0   # LDR display image → [0,1]; HDR floats pass through
    beauty = beauty[..., :3]

    def load(p):
        if p is None:
            return None
        r = load_image(p)
        a = np.asarray(r, np.float32)[..., :3]
        return a / 255.0 if r.dtype == np.uint8 else a
    albedo = load(args.albedo)
    normal = load(args.normal)
    fl = None if args.flow is None else np.asarray(load_image(args.flow))
    prev = load(args.prev)

    kind = (ModelKind.TEMPORAL_UPSCALE2X if args.upscale and prev is not None
            else ModelKind.UPSCALE2X if args.upscale
            else ModelKind.TEMPORAL if prev is not None
            else ModelKind.LDR if args.ldr else ModelKind.HDR)
    den = Denoiser(model_kind=kind, guide_albedo=albedo is not None,
                   guide_normal=normal is not None)
    den.setup(beauty.shape[1], beauty.shape[0], tiled=args.tile > 0,
              tile=args.tile or 256, iterations=args.iterations)
    out = den.invoke(beauty, albedo=albedo, normal=normal, flow=fl,
                     previous_output=prev, blend_factor=args.blend)
    save_image(args.out, np.asarray(out))
    print(f"wrote {args.out} {np.asarray(out).shape} ({kind})")


if __name__ == "__main__":
    main()
