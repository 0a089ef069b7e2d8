"""optixWhitted equivalent: glass sphere-shell, phong sphere, checkered floor,
recursive reflection/refraction + shadows, progressive accumulation.

Reference: `SDK/optixWhitted/` (geometry setup `optixWhitted.cpp:381-430`,
shading from `SDK/cuda/shading.cu`, raygen `SDK/cuda/camera.cu:40`).
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import numpy as np

from ..core import film as film_mod
from ..io.image import save_image, to_ascii
from ..scene.builtins import whitted_camera, whitted_scene
from ..wavefront.whitted import render_whitted_sample


def render(width=768, height=576, samples=4, max_depth=6, scene=None,
           camera=None):
    scene = scene if scene is not None else whitted_scene()
    cam = (camera if camera is not None else
           whitted_camera(width, height)).params()
    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        radiance = render_whitted_sample(scene, cam, width, height,
                                         film.subframe, max_depth=max_depth)
        film = film.accumulate(radiance)
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(description="whitted renderer (optixWhitted)")
    p.add_argument("--file", default="whitted.png")
    p.add_argument("--dim", default="768x576")
    p.add_argument("--samples", type=int, default=16)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--ascii", action="store_true")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    accum, film = render(w, h, samples=args.samples, max_depth=args.depth)
    img = np.asarray(film_mod.make_color(accum))
    save_image(args.file, img)
    if args.ascii:
        print(to_ascii(img))
    print(f"wrote {args.file} ({w}x{h}, {int(film.subframe)} spp)")


if __name__ == "__main__":
    main()
