"""optixMeshViewer equivalent: GLTF viewer on the whitted-style pipeline.

Reference: `SDK/optixMeshViewer/` — `sutil::loadScene` + the shared whitted
PBR pipeline (`optixMeshViewer.cpp:417,283`). Loads any .gltf/.glb, frames
the scene AABB (or uses the GLTF camera), lights it with a headlight
directional + ambient, renders progressively.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import numpy as np

from ..core import film as film_mod
from ..io.image import save_image, to_ascii
from ..scene.scene import Scene
from ..shade.lights import AMBIENT, DIRECTIONAL
from ..wavefront.whitted import render_whitted_sample


def render(path, width=768, height=768, samples=4, max_depth=3, scene=None):
    scene_h = scene if scene is not None else Scene.load(path)
    cam_obj = scene_h.default_camera(width, height)
    # Headlight rig (meshviewer default): directional from the eye + ambient.
    eye = np.asarray(cam_obj.eye)
    lookat = np.asarray(cam_obj.lookat)
    direction = lookat - eye
    direction = direction / max(np.linalg.norm(direction), 1e-9)
    lights = [
        {"kind": DIRECTIONAL, "direction": tuple(direction),
         "color": (0.9, 0.9, 0.9)},
        {"kind": AMBIENT, "color": (0.25, 0.25, 0.25)},
    ]
    device_scene = scene_h.finalize(lights=lights)
    cam = cam_obj.params()
    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        radiance = render_whitted_sample(device_scene, cam, width, height,
                                         film.subframe, max_depth=max_depth)
        film = film.accumulate(radiance)
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(description="GLTF mesh viewer (optixMeshViewer)")
    p.add_argument("--model", "-m", required=True,
                   help=".gltf/.glb/.obj/.ply path")
    p.add_argument("--file", default="meshviewer.png")
    p.add_argument("--dim", default="768x768")
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--ascii", action="store_true")
    p.add_argument("--time", type=float, default=None,
                   help="pose GLTF animations/skins at this second")
    p.add_argument("--animate", type=int, default=0, metavar="N",
                   help="render N frames over the animation's duration "
                        "(writes file stem_000.png ...)")
    p.add_argument("--fps", type=float, default=24.0)
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    if args.animate > 0:
        import os
        from ..scene.gltf import load_gltf
        g = load_gltf(args.model)
        dur = max((a.duration for a in g.animations), default=0.0)
        stem, ext = os.path.splitext(args.file)
        for f in range(args.animate):
            t = (f / args.fps if dur == 0.0
                 else dur * f / max(args.animate - 1, 1))
            scene_h = Scene.load(args.model, time=t)
            accum, film = render(args.model, w, h, samples=args.samples,
                                 scene=scene_h)
            save_image(f"{stem}_{f:03d}{ext}",
                       np.asarray(film_mod.make_color(accum)))
        print(f"wrote {args.animate} frames to {stem}_***{ext} "
              f"(duration {dur:.2f}s)")
        return
    scene_h = Scene.load(args.model, time=args.time)
    accum, film = render(args.model, w, h, samples=args.samples,
                         scene=scene_h)
    img = np.asarray(film_mod.make_color(accum))
    save_image(args.file, img)
    if args.ascii:
        print(to_ascii(img))
    print(f"wrote {args.file} ({w}x{h}, {int(film.subframe)} spp)")


if __name__ == "__main__":
    main()
