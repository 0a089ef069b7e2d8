"""optixConsole equivalent: fixed 96×64 headless render printed as ASCII art.

Reference: `SDK/optixConsole/optixConsole.cpp:121-122,686-760` — the no-GUI
smoke-test sample: deterministic launch, luminance-mapped ASCII to stdout.
The CI-shaped sample (SURVEY.md §4): run it anywhere, eyeball or diff the
text.
"""
from __future__ import annotations

import argparse

import numpy as np

from ..core import film as film_mod
from ..io.image import to_ascii
from ..scene.builtins import cornell_box, cornell_camera
from ..wavefront.engine import render_accumulate

WIDTH, HEIGHT = 96, 64


def render(samples=4, max_depth=3):
    scene = cornell_box()
    cam = cornell_camera(WIDTH, HEIGHT).params()
    film = film_mod.Film.create(HEIGHT, WIDTH)
    film, _ = render_accumulate(scene, cam, film, WIDTH, HEIGHT,
                                samples_per_launch=samples,
                                max_depth=max_depth, chunk_size=None)
    return np.asarray(film.accum)


def main(argv=None):
    p = argparse.ArgumentParser(description="headless ASCII render (optixConsole)")
    p.add_argument("--samples", type=int, default=4)
    args = p.parse_args(argv)
    img = render(samples=args.samples)
    # simple tone map to use the ramp fully, like the sample's luminance scale
    img = img / max(float(np.percentile(img, 97)), 1e-6)
    print(to_ascii(np.clip(img, 0, 1), width=WIDTH))


if __name__ == "__main__":
    main()
