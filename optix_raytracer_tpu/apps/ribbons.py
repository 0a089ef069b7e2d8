"""optixRibbons equivalent: flat (oriented) ribbon curve primitives.

Reference: `SDK/optixRibbons/` — flat ribbon strands (oriented curves). Each
spline segment becomes an oriented parallelogram spanning ±width across the
strand direction (accel/curves.py strand_to_ribbons).
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import numpy as np

from ..accel import curves as cv, primitives as prim
from ..core import film as film_mod
from ..core.camera import Camera
from ..io.image import save_image
from ..scene.device_scene import make_device_scene
from ..shade import materials as mat
from ..shade.lights import AMBIENT, DIRECTIONAL
from ..wavefront.whitted import render_whitted_sample


def make_ribbon_scene(num_ribbons=14, seed=2):
    rng = np.random.default_rng(seed)
    descs = []
    for i in range(num_ribbons):
        x0 = -1.2 + 2.4 * i / max(num_ribbons - 1, 1)
        ctrl = np.stack([
            np.full(6, x0, np.float32) + 0.15 * rng.normal(size=6),
            np.linspace(-0.8, 0.9, 6),
            0.3 * rng.normal(size=6)], 1).astype(np.float32)
        widths = np.full(6, 0.05, np.float32)
        pts, rad, _ = cv.eval_spline(ctrl, widths, cv.CATMULL_ROM, 6)
        descs.extend(cv.strand_to_ribbons(pts, rad, normal=(0, 0, 1),
                                          mat_id=i % 3))
    prims = prim.make_prims(descs)
    materials = [
        {"kind": mat.PHONG, "base_color": (0.85, 0.25, 0.2),
         "specular": (0.3, 0.3, 0.3), "phong_exp": 20.0},
        {"kind": mat.PHONG, "base_color": (0.2, 0.65, 0.3),
         "specular": (0.3, 0.3, 0.3), "phong_exp": 20.0},
        {"kind": mat.PHONG, "base_color": (0.25, 0.35, 0.9),
         "specular": (0.3, 0.3, 0.3), "phong_exp": 20.0},
    ]
    lights = [
        {"kind": DIRECTIONAL, "direction": (-0.3, -0.7, -0.65),
         "color": (0.95, 0.95, 0.9)},
        {"kind": AMBIENT, "color": (0.28, 0.28, 0.3)},
    ]
    empty_v = np.zeros((3, 3), np.float32)
    empty_i = np.zeros((1, 3), np.int32)
    return make_device_scene(empty_v, empty_i, np.zeros(1, np.int32),
                             materials, prims=prims, lights=lights,
                             miss_color=(0.1, 0.11, 0.14))


def render(width=512, height=512, samples=4):
    scene = make_ribbon_scene()
    cam = Camera(eye=(0, 0.1, 3.2), lookat=(0, 0.05, 0), fov_y=40,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        radiance = render_whitted_sample(scene, cam, width, height,
                                         film.subframe, max_depth=2)
        film = film.accumulate(radiance)
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(description="ribbon curves (optixRibbons)")
    p.add_argument("--file", default="ribbons.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--samples", type=int, default=8)
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    accum, film = render(w, h, samples=args.samples)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file}")


if __name__ == "__main__":
    main()
