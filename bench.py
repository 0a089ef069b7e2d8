"""Benchmark: Cornell-box path trace at 1080p — Mrays/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extra}.
Baseline = the driver-set north-star target of 200 Mrays/sec/chip
(BASELINE.json; the reference publishes no numbers — BASELINE.md).

Ray accounting is honest: the engine counts rays actually traced (closest-hit
queries for live lanes + NEE shadow rays), not pixels × depth.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH, HEIGHT = 1920, 1088   # 1080p rounded up to a multiple of 8 rows
SAMPLES = 16               # matches the reference default (optixPathTracer.cpp:929)
MAX_DEPTH = 4
CHUNK = None                 # let XLA see the whole wavefront
BASELINE_MRAYS = 200.0


def main():
    import jax
    from optix_raytracer_tpu.core import film as film_mod
    from optix_raytracer_tpu.scene.builtins import cornell_box, cornell_camera
    from optix_raytracer_tpu.wavefront.engine import render_accumulate

    scene = cornell_box()
    cam = cornell_camera(WIDTH, HEIGHT).params()
    film = film_mod.Film.create(HEIGHT, WIDTH)

    def run(film):
        return render_accumulate(scene, cam, film, WIDTH, HEIGHT,
                                 samples_per_launch=SAMPLES,
                                 max_depth=MAX_DEPTH, chunk_size=CHUNK)

    import jax.numpy as jnp

    def sync(x):
        # block_until_ready is unreliable over the remote-TPU tunnel; a scalar
        # host transfer is a hard sync.
        return float(jnp.sum(x))

    # Warmup / compile
    t0 = time.time()
    film_w, rays_w = run(film)
    sync(film_w.accum)
    compile_s = time.time() - t0

    # Timed runs (progressive launches, like the reference's frame loop)
    n_iters = 2
    t0 = time.time()
    f = film_w
    for _ in range(n_iters):
        f, rays = run(f)
    sync(f.accum)
    dt = time.time() - t0
    total_rays = float(rays) * n_iters

    mrays = total_rays / dt / 1e6
    msamples = WIDTH * HEIGHT * SAMPLES * n_iters / dt / 1e6
    print(json.dumps({
        "metric": "cornell_pathtrace_1080p",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "extra": {
            "msamples_per_s": round(msamples, 2),
            "rays_per_launch": float(rays),
            "samples_per_launch": SAMPLES,
            "max_depth": MAX_DEPTH,
            "resolution": f"{WIDTH}x{HEIGHT}",
            "compile_plus_first_launch_s": round(compile_s, 1),
            "timed_s": round(dt, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
