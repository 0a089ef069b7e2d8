"""Quick TPU probes for development iteration (not the driver bench).

Usage: python tools/bench_quick.py [cornell|regen|textured|knot|anyhit ...]
Runs only the named probes (all when none given), scalar-sync timed,
printing one line each — much faster turnaround than the full bench.py
when iterating on a single kernel.
"""
from __future__ import annotations

import os
import sys
import time

# Self-locating: runnable from any cwd (sys.path[0] is tools/, not the
# repo root, so the package import needs the root added explicitly).
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


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
    sys.path.insert(0, _ROOT)
    import bench
    t0 = time.time()
    v = bench.bench_textured()
    print(f"textured: {v} Mrays/s (total {time.time() - t0:.1f}s)")


def probe_knot():
    sys.path.insert(0, _ROOT)
    import bench
    t0 = time.time()
    v = bench.bench_knot_pathtrace()
    print(f"knot_pathtrace: {v} Mrays/s (total {time.time() - t0:.1f}s)")


def probe_anyhit():
    sys.path.insert(0, _ROOT)
    import bench
    t0 = time.time()
    v = bench.bench_large_mesh()
    print(f"large_mesh: {v} (total {time.time() - t0:.1f}s)")


def probe_groupwalk():
    """A/B the walk's 32-ray group gating on a scattered bounce-like
    wavefront (the exact-cull + sorted path the engine's bounces take).
    Flip ORT_GROUP_WALK's default in clusters._group_walk_default when ON
    wins here."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from optix_raytracer_tpu.accel import clusters as cl, native
    from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
    from optix_raytracer_tpu.core.rays import Rays
    from optix_raytracer_tpu.scene.builtins import trefoil_mesh

    verts, idx, normals = trefoil_mesh(200, 63)
    geom = build_triangle_geometry(verts, idx, normals=normals)
    cs = cl.build_clusters(geom, jnp.zeros((geom.num_triangles,), jnp.int32),
                           order=native.sah_leaf_order(geom))
    n = 1 << 21
    rng = np.random.default_rng(0)
    # bounce-like: origins on a shell around the knot, cosine-ish dirs
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    live = rng.random(n) < 0.6          # mixed-liveness like depth 2
    rays = Rays(origin=jnp.asarray(o), direction=jnp.asarray(d),
                tmin=jnp.full((n,), 1e-3, jnp.float32),
                tmax=jnp.where(jnp.asarray(live), 1e16, 0.0).astype(
                    jnp.float32))
    for gw in (False, True):
        h = cl.closest_hit_sorted(cs, rays, group_walk=gw)
        _sync(h.t)
        t0 = time.time()
        for _ in range(3):
            h = cl.closest_hit_sorted(cs, rays, group_walk=gw)
        _sync(h.t)
        dt = (time.time() - t0) / 3
        print(f"groupwalk={'ON ' if gw else 'OFF'}: "
              f"{n / dt / 1e6:.1f} Mrays/s ({dt * 1e3:.0f} ms)")


def probe_splmajor():
    """Sample-major spl=16 knot launches (the amortize-across-samples
    lever) A/B'd three ways, all through render_accumulate and the same
    estimator: spl-major gated, spl-major ungated (explicit
    group_walk=False — a real static-arg specialization, not env state),
    and the per-sample sequential XLA wavefront baseline (impl="xla",
    spl=16 traced one sample at a time with coherence-sorted bounces)."""
    import numpy as np
    import jax.numpy as jnp
    from optix_raytracer_tpu.core import film as film_mod
    from optix_raytracer_tpu.scene.builtins import knot_camera, trefoil_mesh
    from optix_raytracer_tpu.scene.device_scene import make_device_scene
    from optix_raytracer_tpu.wavefront.engine import render_accumulate

    w, h = 1920, 1088
    spl = int(os.environ.get("ORT_PROBE_SPL", "16"))
    verts, idx, normals = trefoil_mesh(200, 63)
    scene = make_device_scene(verts, idx, np.zeros(len(idx), np.int32),
                              [{"kind": 0, "base_color": (0.7, 0.6, 0.5)}],
                              normals=normals)
    cam = knot_camera(w, h).params()
    cases = (("spl gated  ", "spl", True),
             ("spl ungated", "spl", False),
             ("xla seq    ", "xla", None))
    if os.environ.get("ORT_PROBE_GATED_ONLY"):
        cases = cases[:1]
    for name, impl, gw in cases:
        film = film_mod.Film.create(h, w)
        t0 = time.time()
        film, rays = render_accumulate(scene, cam, film, w, h,
                                       samples_per_launch=spl, max_depth=3,
                                       chunk_size=None, impl=impl,
                                       group_walk=gw)
        _sync(film.accum)
        compile_s = time.time() - t0
        t0 = time.time()
        n = 2
        for _ in range(n):
            film, rays = render_accumulate(scene, cam, film, w, h,
                                           samples_per_launch=spl,
                                           max_depth=3,
                                           chunk_size=None, impl=impl,
                                           group_walk=gw)
        _sync(film.accum)
        dt = (time.time() - t0) / n
        print(f"splmajor spl={spl} {name}: "
              f"{float(rays) / dt / 1e6:.1f} Mrays/s "
              f"(compile {compile_s:.0f}s, run {dt:.2f}s, "
              f"{float(rays)/1e6:.1f} Mrays/launch)", flush=True)


PROBES = {"cornell": probe_cornell, "regen": probe_regen,
          "textured": probe_textured, "knot": probe_knot,
          "anyhit": probe_anyhit, "groupwalk": probe_groupwalk,
          "splmajor": probe_splmajor}


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
