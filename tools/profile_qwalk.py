"""A/B the cluster-major queue traversal against the shipped gated walk.

The round-4 verdict's incoherent-traversal ask: build a genuinely
different traversal for scattered wavefronts and measure it. This times
both designs on the SAME wavefronts (the 25k-knot bounce + NEE shadow
distributions profile_knot.py uses) with scalar-sync discipline, plus the
queue's stage breakdown (cull / build+marshal / kernel / reduce), so the
design-space record in TODO.md carries measured numbers.

Usage: python tools/profile_qwalk.py [n_rounds] [--dim WxH]
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

    from optix_raytracer_tpu.accel import clusters as cl, native, qwalk
    from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
    from optix_raytracer_tpu.core.camera import generate_rays
    from optix_raytracer_tpu.core.rays import Rays
    from optix_raytracer_tpu.scene.builtins import knot_camera, trefoil_mesh

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    w, h = 1920, 1088
    n = w * h
    verts, idx, normals = trefoil_mesh(200, 63)
    geom = build_triangle_geometry(verts, idx, normals=normals)
    cs = cl.build_clusters(geom, jnp.zeros((geom.num_triangles,), jnp.int32),
                           order=native.sah_leaf_order(geom))
    print(f"# {geom.num_triangles} tris, {cs.num_clusters} clusters",
          flush=True)

    rays, _ = generate_rays(knot_camera(w, h).params(), w, h,
                            rng_state=None, jitter=False)
    flat = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)
    hits = cl.closest_hit(cs, flat)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    live = np.asarray(hits.valid)
    p = np.asarray(flat.origin + flat.direction * hits.t[:, None] * 0.999)
    bounce = Rays(origin=jnp.asarray(p), direction=jnp.asarray(d),
                  tmin=jnp.full((n,), 1e-3, jnp.float32),
                  tmax=jnp.where(jnp.asarray(live), 1e16, 0.0))
    kb = np.asarray(cl.coherence_key(cs, bounce))
    bperm = jnp.asarray(np.argsort(kb))
    bsorted = jax.tree.map(lambda a: a[bperm], bounce)
    n_live = float(live.sum())

    lp = jnp.asarray([0.0, 8.0, 0.0])
    delta = lp - jnp.asarray(p)
    dist = jnp.linalg.norm(delta, axis=1, keepdims=True)
    sh = Rays(origin=jnp.asarray(p), direction=delta / dist,
              tmin=jnp.full((n,), 1e-3, jnp.float32),
              tmax=jnp.where(jnp.asarray(live), dist[:, 0] * 0.999, 0.0))
    shs = jax.tree.map(lambda a: a[bperm], sh)   # same coherence order

    print("# queue stats (bounce):",
          qwalk.queue_stats(cs, bsorted), flush=True)
    print("# queue stats (shadow):",
          qwalk.queue_stats(cs, shs), flush=True)

    def timed(name, fn, count=n_live):
        fn()
        sync(fn())
        t0 = time.time()
        out = None
        for _ in range(rounds):
            out = fn()
        sync(out)
        dt = (time.time() - t0) / rounds
        print(f"{name:34s} {dt * 1e3:8.1f} ms   "
              f"{count / dt / 1e6:8.1f} Mrays/s (live)", flush=True)
        return dt

    # --- closest hit on the sorted bounce wavefront ---
    timed("walk closest (exact, gated)",
          lambda: cl.closest_hit(cs, bsorted, exact=True, group_walk=True))
    timed("walk closest (exact, ungated)",
          lambda: cl.closest_hit(cs, bsorted, exact=True, group_walk=False))
    timed("QUEUE closest (bounce)",
          lambda: qwalk.closest_hit(cs, bsorted))

    # --- any hit on the NEE shadow wavefront ---
    timed("walk anyhit (exact, gated)",
          lambda: cl.any_hit(cs, shs, exact=True, group_walk=True))
    timed("QUEUE anyhit (shadow)",
          lambda: qwalk.any_hit(cs, shs))

    # --- e2e knot path trace: shipped sample-major walk vs ORT_QWALK ---
    if "--e2e" in sys.argv:
        import os
        from optix_raytracer_tpu.core import film as film_mod
        from optix_raytracer_tpu.scene.device_scene import make_device_scene
        from optix_raytracer_tpu.wavefront.engine import render_accumulate

        scene = make_device_scene(verts, idx, np.zeros(len(idx), np.int32),
                                  [{"kind": 0,
                                    "base_color": (0.7, 0.6, 0.5)}],
                                  normals=normals)
        cam = knot_camera(w, h).params()

        def e2e(spl):
            f = film_mod.Film.create(h, w)
            f, rays_t = render_accumulate(scene, cam, f, w, h,
                                          samples_per_launch=spl,
                                          max_depth=3, chunk_size=None)
            return f.accum, rays_t

        for flag in ("0", "1"):
            os.environ["ORT_QWALK"] = flag
            # the env flag is read at trace time — drop cached
            # executables so the A/B actually recompiles both variants
            jax.clear_caches()
            acc, rays_t = e2e(16)
            sync(acc)
            t0 = time.time()
            for _ in range(rounds):
                acc, rays_t = e2e(16)
            sync(acc)
            dt = (time.time() - t0) / rounds
            print(f"e2e spl16 depth3 ORT_QWALK={flag:s}   {dt * 1e3:8.1f} ms"
                  f"   {float(rays_t) / dt / 1e6:8.1f} Mrays/s", flush=True)
        os.environ.pop("ORT_QWALK", None)

    # --- queue stage breakdown (bounce closest config) ---
    qf = 6
    n_r, n_padded, packed, n_blocks, c_pad, k_cap = qwalk._prep(
        cs, bsorted, qf)
    timed("  stage: oct cull",
          lambda: qwalk._oct_cull(cs, packed, n_blocks, c_pad, False))
    om = qwalk._oct_cull(cs, packed, n_blocks, c_pad, False)
    om.block_until_ready()
    build = jax.jit(lambda om_: qwalk._build_queue(
        om_, cs.num_clusters, n_padded, k_cap))
    timed("  stage: queue build", lambda: build(om))
    steps_, wo_, _, _ = build(om)
    marshal = jax.jit(lambda w_: qwalk._marshal(packed, w_, n_padded))
    timed("  stage: marshal", lambda: marshal(wo_))
    qr_, qrow_ = marshal(wo_)
    runq = jax.jit(lambda s_, q_: qwalk._run_queue(
        qwalk._q_closest_kernel, 8, cs, s_, q_, False))
    timed("  stage: queue kernel", lambda: runq(steps_, qr_))
    cand_ = runq(steps_, qr_)
    red = jax.jit(lambda c_: jax.ops.segment_min(
        jnp.where(c_[6] >= 0.0, c_[0], 3e38), qrow_,
        num_segments=n_padded + 1))
    timed("  stage: reduce (tmin only)", lambda: red(cand_))


if __name__ == "__main__":
    main()
