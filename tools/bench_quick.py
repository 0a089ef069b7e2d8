"""Quick TPU probes for development iteration (not the driver bench).

Usage: python tools/bench_quick.py [cornell|regen|textured|knot|anyhit ...]
Runs only the named probes (all when none given), scalar-sync timed,
printing one line each — much faster turnaround than the full bench.py
when iterating on a single kernel.
"""
from __future__ import annotations

import sys
import time


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def probe_cornell(regen=False):
    import jax.numpy as jnp

    from optix_raytracer_tpu.scene.builtins import cornell_box, cornell_camera
    from optix_raytracer_tpu.wavefront.pallas_pt import render_sum_fused
    w, h = 1920, 1088
    scene = cornell_box()
    cam = cornell_camera(w, h).params()
    t0 = time.time()
    rad, rays = render_sum_fused(scene, cam, w, h, 0, samples_per_launch=16,
                                 max_depth=4, regen=regen)
    _sync(rad)
    compile_s = time.time() - t0
    t0 = time.time()
    n = 2
    for i in range(n):
        rad, rays = render_sum_fused(scene, cam, w, h, 1 + i,
                                     samples_per_launch=16, max_depth=4,
                                     regen=regen)
    _sync(rad)
    dt = (time.time() - t0) / n
    name = "cornell_regen" if regen else "cornell"
    print(f"{name}: {float(rays) / dt / 1e6:.1f} Mrays/s "
          f"(compile {compile_s:.1f}s, run {dt * 1e3:.0f} ms)")


def probe_regen():
    probe_cornell(regen=True)


def probe_textured():
    sys.path.insert(0, ".")
    import bench
    t0 = time.time()
    v = bench.bench_textured()
    print(f"textured: {v} Mrays/s (total {time.time() - t0:.1f}s)")


def probe_knot():
    sys.path.insert(0, ".")
    import bench
    t0 = time.time()
    v = bench.bench_knot_pathtrace()
    print(f"knot_pathtrace: {v} Mrays/s (total {time.time() - t0:.1f}s)")


def probe_anyhit():
    sys.path.insert(0, ".")
    import bench
    t0 = time.time()
    v = bench.bench_large_mesh()
    print(f"large_mesh: {v} (total {time.time() - t0:.1f}s)")


PROBES = {"cornell": probe_cornell, "regen": probe_regen,
          "textured": probe_textured, "knot": probe_knot,
          "anyhit": probe_anyhit}


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        PROBES[n]()


if __name__ == "__main__":
    main()
