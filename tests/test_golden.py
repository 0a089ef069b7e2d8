"""Golden-image regression gate for the north-star Cornell render.

The acceptance-test shape of SURVEY.md §4: a deterministic small render is
compared against a stored golden (RMSE gate). The golden is regenerated with
`python tests/test_golden.py regen` — any intentional estimator change must
update it consciously.
"""
import os
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "cornell_32x32_64spp.npz")
W = H = 32
SAMPLES = 64
DEPTH = 3
# RMSE tolerance: generous enough for cross-platform f32 reassociation,
# tight enough to catch estimator changes (MC noise is frozen — the RNG is
# deterministic, so platform-identical runs differ only by fp rounding).
RMSE_TOL = 3e-3


def render():
    from optix_raytracer_tpu.core import film as film_mod
    from optix_raytracer_tpu.scene.builtins import cornell_box, cornell_camera
    from optix_raytracer_tpu.wavefront.engine import render_accumulate
    scene = cornell_box()
    cam = cornell_camera(W, H).params()
    film, _ = render_accumulate(scene, cam, film_mod.Film.create(H, W),
                                W, H, samples_per_launch=SAMPLES,
                                max_depth=DEPTH, chunk_size=None, impl="xla")
    return np.asarray(film.accum)


def test_cornell_matches_golden():
    assert os.path.exists(GOLDEN_PATH), \
        "golden missing — run: python tests/test_golden.py regen"
    with np.load(GOLDEN_PATH) as z:
        golden = z["image"]
    img = render()
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    assert rmse < RMSE_TOL, f"RMSE vs golden: {rmse:.5f}"


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, image=render())
        print(f"wrote {GOLDEN_PATH}")
