"""Work model for the 4M-triangle supercluster tier (VERDICT r4 item 6).

The 4.19M-knot closest-hit runs ~6 Mrays/s (bench knot4m_closest_mrays)
vs 26 at the 500k streaming tier — this tool decomposes WHY, the way
TODO.md's pair-test model explains the 25k bounce wall:

  measured: e2e closest-hit time on the real chip (+ the 500k tier for
            reference), SC cull time in isolation
  counted:  listed superclusters per 256-ray sub-block (the DMA unit),
            member-cluster crossings per listed supercluster (the
            pair-test gate), both from the same slab math the kernels run
  derived:  per-launch DMA bytes (listed x 512 KB), pair-test blocks,
            their speed-of-light times, and the residual = loop/
            conditional overhead the kernel pays per supercluster step.

Usage: python tools/profile_sc.py [n_rounds]
"""
from __future__ import annotations

import sys
import time


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
    from optix_raytracer_tpu.accel.clusters import (LANES, SC_CLUSTERS, SUB,
                                                    SUPER,
                                                    MAX_STREAM_CLUSTERS)
    from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
    from optix_raytracer_tpu.core.camera import generate_rays
    from optix_raytracer_tpu.scene.builtins import knot_camera, trefoil_mesh

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    w, h = 1920, 1088
    n = w * h
    t0 = time.time()
    verts, idx, normals = trefoil_mesh(1450, 1380)       # 4.0M tris
    geom = build_triangle_geometry(verts, idx, normals=normals)
    cs = cl.build_clusters(geom, jnp.zeros((geom.num_triangles,), jnp.int32),
                           order=native.sah_leaf_order(geom))
    assert cs.num_clusters > MAX_STREAM_CLUSTERS
    print(f"# {geom.num_triangles} tris, {cs.num_clusters} clusters, "
          f"build {time.time() - t0:.1f}s", flush=True)

    rays, _ = generate_rays(knot_camera(w, h).params(), w, h,
                            rng_state=None, jitter=False)
    flat = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    key = ((yy // 16) * (w // 16) + (xx // 16)).ravel() * 256 \
        + ((yy % 16) * 16 + (xx % 16)).ravel()
    perm = jnp.asarray(np.argsort(key))
    tiled = jax.tree.map(lambda a: a[perm], flat)

    # --- counted: SC cull statistics (same interval-slab math as the
    # kernel's stage 1, pure XLA) ---
    n_padded = -(-n // SUPER) * SUPER
    packed = cl._pack_rays(tiled, n_padded)
    n_blocks = n_padded // SUB
    cull_aabb, member, n_sc = cl._sc_tables(cs)
    facade = cl._sc_facade(cs, cull_aabb, n_sc)
    sc_pad = cull_aabb.shape[0] * LANES
    mask, tnear = cl._block_cull(facade, packed, n_blocks, sc_pad)
    mask = np.asarray(mask)[:, :n_sc]
    listed = mask.sum(axis=1)
    live = listed > 0
    L = float(listed[live].mean())
    print(f"# superclusters: {n_sc}; listed/live-block mean {L:.2f} "
          f"(p95 {np.percentile(listed[live], 95):.0f}), "
          f"live blocks {live.sum()}/{n_blocks}", flush=True)

    # member crossings on a sample of live blocks (exact per-ray slab)
    pk = np.asarray(packed).reshape(n_blocks, SUB, 8)
    mem = np.asarray(member)                     # [sc_pad, 6, 128]
    rng = np.random.default_rng(0)
    samp = rng.choice(np.nonzero(live)[0], size=min(64, int(live.sum())),
                      replace=False)
    cross_counts = []
    for b in samp:
        a = pk[b]
        o, d = a[:, 0:3], a[:, 3:6]
        tmin, tmax = a[:, 6:7], a[:, 7:8]
        inv = np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0, 1, d),
                       np.where(d < 0, -1e12, 1e12))
        for s in np.nonzero(mask[b])[0]:
            ab = mem[s]                          # [6, 128]
            tn = np.full((SUB, LANES), -3e38, np.float32)
            tf = np.full((SUB, LANES), 3e38, np.float32)
            for ax in range(3):
                t0_ = (ab[ax][None, :] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
                t1_ = (ab[ax + 3][None, :] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
                tn = np.maximum(tn, np.minimum(t0_, t1_))
                tf = np.minimum(tf, np.maximum(t0_, t1_))
            crossed = ((np.maximum(tn, tmin) <= np.minimum(tf, tmax))
                       & (tmax > tmin))
            cross_counts.append(crossed[:, :SC_CLUSTERS].any(axis=0).sum())
    M = float(np.mean(cross_counts))
    print(f"# member clusters crossing per (block, listed SC): "
          f"mean {M:.2f} of {SC_CLUSTERS} (p95 "
          f"{np.percentile(cross_counts, 95):.0f})", flush=True)

    # --- derived speed-of-light model ---
    nlive = int(live.sum())
    dma_bytes = nlive * L * SC_CLUSTERS * 32 * LANES * 4
    pair_blocks = nlive * L * M                    # (256,128) pair tests
    t_dma = dma_bytes / 800e9
    t_pair = pair_blocks * 0.7e-6                  # measured VPU rate
    t_pre = nlive * L * 0.7e-6 / 4                 # member pre-test, 1 slab
    print(f"# model: DMA {dma_bytes / 1e9:.2f} GB -> {t_dma * 1e3:.1f} ms; "
          f"pair {pair_blocks:.0f} blocks -> {t_pair * 1e3:.1f} ms; "
          f"pre-test -> {t_pre * 1e3:.1f} ms", flush=True)

    # --- measured ---
    def timed(name, fn, count=n):
        fn()
        jax.block_until_ready(fn())
        t0 = time.time()
        out = None
        for _ in range(rounds):
            out = fn()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.time() - t0) / rounds
        print(f"{name:28s} {dt * 1e3:8.1f} ms   "
              f"{count / dt / 1e6:8.1f} Mrays/s", flush=True)
        return dt

    t_e2e = timed("4M closest (SC tier)",
                  lambda: cl.closest_hit(cs, tiled))
    resid = t_e2e - (t_dma if t_dma > t_pair else t_pair) - t_pre
    print(f"# residual vs max(DMA,pair)+pre model: {resid * 1e3:.1f} ms "
          f"({resid / t_e2e * 100:.0f}% of e2e) = per-SC-step loop/"
          f"conditional overhead + cull + emit", flush=True)
    per_step = resid / max(nlive * L, 1)
    print(f"# implied overhead per (block, SC) step: {per_step * 1e6:.2f} us",
          flush=True)


if __name__ == "__main__":
    main()
