"""optixPathTracer equivalent: progressive Cornell-box path tracer (north star).

Reference: `SDK/optixPathTracer/` — Cornell box, NEE + Russian roulette,
progressive accumulation buffer, `--file` headless mode and
`--launch-samples` (`optixPathTracer.cpp:927-1092`).
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim
import time

import jax
import numpy as np

from ..core import film as film_mod
from ..io.image import save_image, to_ascii
from ..scene.builtins import cornell_box, cornell_camera
from ..wavefront.engine import render_accumulate


def render(width=768, height=768, samples=16, max_depth=4, chunk_size=65536,
           scene=None, camera=None, film=None, samples_per_launch=None):
    """Render and return (linear radiance [H,W,3] jnp, Film)."""
    scene = scene if scene is not None else cornell_box()
    cam = (camera if camera is not None else cornell_camera(width, height)).params()
    film = film if film is not None else film_mod.Film.create(height, width)
    spl = samples_per_launch or samples
    done = 0
    while done < samples:
        step = min(spl, samples - done)
        film, _ = render_accumulate(scene, cam, film, width, height,
                                    samples_per_launch=step,
                                    max_depth=max_depth, chunk_size=chunk_size)
        done += step
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(description="Cornell-box path tracer (optixPathTracer)")
    p.add_argument("--file", default="cornell.png")
    p.add_argument("--dim", default="768x768")
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--launch-samples", type=int, default=16,
                   help="samples per launch (reference default 16)")
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--ascii", action="store_true")
    p.add_argument("--denoise", action="store_true",
                   help="run the AI-denoiser stage with albedo/normal guides "
                        "(the optixDenoiser post-pass)")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)

    t0 = time.time()
    accum, film = render(w, h, samples=args.samples, max_depth=args.depth,
                         samples_per_launch=args.launch_samples)
    accum.block_until_ready()
    dt = time.time() - t0
    if args.denoise:
        from ..api.denoiser import Denoiser
        from ..scene.builtins import cornell_box, cornell_camera
        from ..wavefront.engine import render_aovs
        aovs = render_aovs(cornell_box(), cornell_camera(w, h).params(), w, h)
        den = Denoiser().setup(w, h)
        accum = den.invoke(accum, albedo=aovs["albedo"],
                           normal=aovs["normal"],
                           emission=aovs["emission"])
    img = np.asarray(film_mod.make_color(accum))
    save_image(args.file, img)
    if args.ascii:
        print(to_ascii(img))
    n_pixels = w * h
    print(f"wrote {args.file} ({w}x{h}, {int(film.subframe)} spp, "
          f"{dt:.2f}s, {n_pixels * args.samples / dt / 1e6:.2f} Msamples/s)")


if __name__ == "__main__":
    main()
