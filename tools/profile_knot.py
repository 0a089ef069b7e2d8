"""Per-stage breakdown of the knot path-trace bounce pipeline on TPU.

The end-to-end knot number (bench.py knot25k_pathtrace_mrays) mixes five
very different costs; this tool times each in isolation with scalar-sync
discipline so a TPU session immediately shows which lever to pull:

  1. primary closest-hit (coherent, interval cull)
  2. bounce-like closest-hit (scattered dirs, exact cull, pre-sorted)
  3. the coherence sort itself (variadic state sort proxy)
  4. NEE shadow any-hit (exact cull + early exit)
  5. full render_accumulate e2e (the bench number)

Usage: python tools/profile_knot.py [n_rounds]
"""
from __future__ import annotations

import sys
import time


def sync(x):
    import jax
    import jax.numpy as jnp
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from optix_raytracer_tpu.accel import clusters as cl, native
    from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
    from optix_raytracer_tpu.core import film as film_mod
    from optix_raytracer_tpu.core.camera import generate_rays
    from optix_raytracer_tpu.core.rays import Rays
    from optix_raytracer_tpu.scene.builtins import knot_camera, trefoil_mesh
    from optix_raytracer_tpu.scene.device_scene import make_device_scene
    from optix_raytracer_tpu.wavefront.engine import render_accumulate

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    w, h = 1920, 1088
    n = w * h
    verts, idx, normals = trefoil_mesh(200, 63)
    geom = build_triangle_geometry(verts, idx, normals=normals)
    cs = cl.build_clusters(geom, jnp.zeros((geom.num_triangles,), jnp.int32),
                           order=native.sah_leaf_order(geom))

    rays, _ = generate_rays(knot_camera(w, h).params(), w, h,
                            rng_state=None, jitter=False)
    flat = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)

    def timed(name, fn, count=n):
        fn()                      # compile + warm
        sync_dummy = fn()
        sync(sync_dummy)
        t0 = time.time()
        for _ in range(rounds):
            out = fn()
        sync(out)
        dt = (time.time() - t0) / rounds
        print(f"{name:28s} {dt * 1e3:8.1f} ms   "
              f"{count / dt / 1e6:8.1f} Mrays/s")
        return dt

    # 1. coherent primaries (tile order)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    key = ((yy // 16) * (w // 16) + (xx // 16)).ravel() * 256 \
        + ((yy % 16) * 16 + (xx % 16)).ravel()
    perm = jnp.asarray(np.argsort(key))
    tiled = jax.tree.map(lambda a: a[perm], flat)
    timed("primary closest (interval)", lambda: cl.closest_hit(cs, tiled))

    # 2. bounce-like wavefront: origins on the surface, random dirs,
    #    ~60% live (the depth-2 reality), pre-sorted by coherence key
    hits = cl.closest_hit(cs, tiled)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    live = np.asarray(hits.valid)
    p = np.asarray(tiled.origin + tiled.direction * hits.t[:, None] * 0.999)
    bounce = Rays(origin=jnp.asarray(p), direction=jnp.asarray(d),
                  tmin=jnp.full((n,), 1e-3, jnp.float32),
                  tmax=jnp.where(jnp.asarray(live), 1e16, 0.0))
    kb = np.asarray(cl.coherence_key(cs, bounce))
    bperm = jnp.asarray(np.argsort(kb))
    bsorted = jax.tree.map(lambda a: a[bperm], bounce)
    n_live = float(live.sum())
    timed("bounce closest (exact,sorted)",
          lambda: cl.closest_hit(cs, bsorted, exact=True), count=n_live)

    # 3. the sort cost proxy: coherence key + 20-column variadic sort
    state_cols = [jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
                  for _ in range(20)]

    def sort_state():
        k = cl.coherence_key(cs, bounce)
        out = jax.lax.sort([k] + state_cols, dimension=0, num_keys=1)
        return out[1]

    timed("coherence sort (20 cols)", sort_state)

    # 4. NEE shadow wavefront from the primary hits
    lp = jnp.asarray([0.0, 8.0, 0.0])
    delta = lp - jnp.asarray(p)
    dist = jnp.linalg.norm(delta, axis=1, keepdims=True)
    sh = Rays(origin=jnp.asarray(p), direction=delta / dist,
              tmin=jnp.full((n,), 1e-3, jnp.float32),
              tmax=jnp.where(jnp.asarray(live), dist[:, 0] * 0.999, 0.0))
    timed("shadow anyhit (exact)",
          lambda: cl.any_hit(cs, sh, exact=True), count=n_live)

    # 5. end-to-end (the bench number)
    scene = make_device_scene(verts, idx, np.zeros(len(idx), np.int32),
                              [{"kind": 0, "base_color": (0.7, 0.6, 0.5)}],
                              normals=normals)
    cam = knot_camera(w, h).params()

    def e2e():
        f = film_mod.Film.create(h, w)
        f, rays_t = render_accumulate(scene, cam, f, w, h,
                                      samples_per_launch=1, max_depth=3,
                                      chunk_size=None)
        return f.accum, rays_t

    e2e()
    acc, rays_t = e2e()
    sync(acc)
    t0 = time.time()
    for _ in range(rounds):
        acc, rays_t = e2e()
    sync(acc)
    dt = (time.time() - t0) / rounds
    print(f"{'e2e pathtrace (depth 3)':28s} {dt * 1e3:8.1f} ms   "
          f"{float(rays_t) / dt / 1e6:8.1f} Mrays/s")


if __name__ == "__main__":
    main()
