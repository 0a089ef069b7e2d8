"""optixOpacityMicromap equivalent: pre-classified alpha-mask geometry.

Reference: `SDK/optixOpacityMicromap/` — opacity micromaps accelerate
alpha-tested quads by classifying sub-triangle regions so most anyhit
invocations are skipped. Here the micromap is built at scene setup
(accel/micromap.build_opacity_micromap) and the render shows the same
checkerboard-masked quad; the classification statistics are reported (the
fraction of micro-triangles that needed no mask evaluation).
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import numpy as np

from ..accel.micromap import (OPAQUE, TRANSPARENT, UNKNOWN_OPAQUE,
                              build_opacity_micromap, checker_mask)
from ..core import film as film_mod
from ..io.image import save_image
from ..scene.device_scene import make_device_scene
from ..shade import materials as mat
from ..shade.lights import ParallelogramLight
from ..core.camera import Camera
from ..wavefront.engine import render_accumulate

# Power-of-two checker frequency: the mask's cell edges then lie ON the
# micro-triangle lattice at any level >= 2, so the conservative
# classifier (which marks straddling micro-tris UNKNOWN) can certify
# every micro-triangle — the configuration the reference sample
# demonstrates (most anyhit invocations skipped).
CHECKER_SCALE = 4.0


def make_scene():
    """A masked quad floating above a diffuse floor, area-lit."""
    verts = np.array([
        # masked quad (two triangles) at y=1
        [-1, 1.0, -1], [1, 1.0, -1], [1, 1.0, 1], [-1, 1.0, 1],
        # floor
        [-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                    [0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tri_mat = np.array([0, 0, 1, 1], np.int32)
    materials = [
        {"kind": mat.DIFFUSE, "base_color": (0.9, 0.4, 0.2),
         "alpha_mode": mat.ALPHA_MASK, "cutout": mat.CUT_CHECKER,
         "checker_scale": CHECKER_SCALE},
        {"kind": mat.DIFFUSE, "base_color": (0.7, 0.7, 0.75)},
    ]
    light = ParallelogramLight.make((1.5, 4.0, -1.0), (-3.0, 0, 0),
                                    (0, 0, 2.0), (6.0, 6.0, 6.0))
    scene = make_device_scene(verts, idx, tri_mat, materials,
                              area_light=light, uvs=uvs,
                              miss_color=(0.1, 0.12, 0.2))
    return scene


def build_micromap(scene, level=3):
    states, summary = build_opacity_micromap(
        np.asarray(scene.geom.corner_uv), checker_mask(CHECKER_SCALE),
        level=level)
    return states, summary


def render(width=512, height=512, samples=8, level=3):
    scene = make_scene()
    states, summary = build_micromap(scene, level)
    known = (summary != UNKNOWN_OPAQUE).mean()
    cam = Camera(eye=(0, 2.2, 4.0), lookat=(0, 0.7, 0), fov_y=40,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    film, _ = render_accumulate(scene, cam, film, width, height,
                                samples_per_launch=samples, max_depth=3,
                                chunk_size=None)
    return film.accum, dict(
        micro_states=states, tri_summary=summary,
        fully_classified_fraction=float(known),
        opaque_fraction=float((states == OPAQUE).mean()),
        transparent_fraction=float((states == TRANSPARENT).mean()))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="opacity micromaps (optixOpacityMicromap)")
    p.add_argument("--file", default="omm.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--samples", type=int, default=16)
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    accum, stats = render(w, h, samples=args.samples, level=args.level)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file}; micromap level {args.level}: "
          f"{stats['opaque_fraction']:.0%} opaque, "
          f"{stats['transparent_fraction']:.0%} transparent micro-tris, "
          f"{stats['fully_classified_fraction']:.0%} tris fully classified")


if __name__ == "__main__":
    main()
