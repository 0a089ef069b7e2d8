"""optixCurves equivalent: built-in curve primitives (B-spline & friends).

Reference: `SDK/optixCurves/` — linear/quadratic/cubic B-spline, Catmull-Rom
and Bézier strands built as curve GAS (`optixCurves.cpp:380-412`). Here the
splines are evaluated up front (accel/curves.py) and tessellated into round
capsule segments shaded by curve parameter u.
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

KINDS = [cv.LINEAR, cv.QUADRATIC_BSPLINE, cv.CUBIC_BSPLINE, cv.CATMULL_ROM,
         cv.BEZIER]


def make_curve_scene(kind=cv.CUBIC_BSPLINE, samples_per_segment=10,
                     swept=False):
    # a spiral strand of control points
    ts = np.linspace(0, 2.2 * np.pi, 10)
    control = np.stack([0.7 * np.cos(ts), np.linspace(-0.8, 0.8, len(ts)),
                        0.7 * np.sin(ts)], 1).astype(np.float32)
    widths = np.linspace(0.12, 0.03, len(ts)).astype(np.float32)
    if swept and kind == cv.QUADRATIC_BSPLINE:
        # true swept-curve intersector: one primitive per bspline span
        descs = cv.strand_to_swept_quads(control, widths, mat_id=0)
    elif swept and kind in (cv.CUBIC_BSPLINE, cv.CATMULL_ROM, cv.BEZIER):
        descs = cv.strand_to_swept_cubics(control, widths, kind=kind,
                                          mat_id=0)
    else:
        pts, radii, us = cv.eval_spline(control, widths, kind,
                                        samples_per_segment)
        descs = cv.strand_to_capsules(pts, radii, mat_id=0)
    prims = prim.make_prims(descs)
    materials = [{"kind": mat.PHONG, "base_color": (0.8, 0.35, 0.1),
                  "specular": (0.4, 0.4, 0.4), "phong_exp": 24.0}]
    lights = [
        {"kind": DIRECTIONAL, "direction": (-0.4, -0.8, -0.45),
         "color": (0.9, 0.9, 0.9)},
        {"kind": AMBIENT, "color": (0.3, 0.3, 0.32)},
    ]
    empty_v = np.zeros((3, 3), np.float32)
    empty_i = np.zeros((1, 3), np.int32)
    return make_device_scene(empty_v, empty_i, np.zeros(1, np.int32),
                             materials, prims=prims, lights=lights,
                             miss_color=(0.12, 0.12, 0.16))


def render(width=512, height=512, samples=4, kind=cv.CUBIC_BSPLINE,
           swept=False):
    scene = make_curve_scene(kind, swept=swept)
    cam = Camera(eye=(0, 0.2, 3.0), lookat=(0, 0, 0), fov_y=45,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        radiance = render_whitted_sample(scene, cam, width, height,
                                         film.subframe, max_depth=2)
        film = film.accumulate(radiance)
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(description="curve primitives (optixCurves)")
    p.add_argument("--file", default="curves.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--kind", default=cv.CUBIC_BSPLINE, choices=KINDS)
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--swept", action="store_true",
                   help="true swept-curve intersector instead of capsule "
                        "tessellation (quadratic/cubic bspline, "
                        "catmullrom, bezier)")
    args = p.parse_args(argv)
    if args.swept and args.kind == cv.LINEAR:
        args.kind = cv.QUADRATIC_BSPLINE
    w, h = parse_dim(args.dim)
    accum, film = render(w, h, samples=args.samples, kind=args.kind,
                         swept=args.swept)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} ({args.kind}{' swept' if args.swept else ''})")


if __name__ == "__main__":
    main()
