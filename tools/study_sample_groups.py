"""Work-count study: sample-major wavefront grouping vs coherence sort.

The round-3 work model (TODO.md "WORK-MODEL CEILING") says the knot path
trace is pair-test bound and that the lock-step design's remaining waste
is sub-32-row divergence: per-ray true crossings are ~5.5 clusters but a
sorted 32-ray group's union is ~3-4x that. The candidate fix is to stop
sorting strangers together and instead trace S samples of the SAME pixel
as one 32-row walk group (they share origin at bounce 1, and share the
light direction for NEE shadows), reusing one walked cluster list per
pixel — the "amortize across samples" road to 30+ Mrays/s.

This tool measures, with exact slab tests and no TPU:
  per-ray crossings (the floor), group-gated rows/ray, ungated rows/ray
for (a) the current scheme: 1 sample/pixel, coherence-sorted, 32-groups
of strangers; (b) sample-major: 32 samples/pixel = one group, 8 pixels =
one 256-ray block, NO sort. Bounce-1 closest, bounce-1 NEE shadows, and
bounce-2 closest (where sample paths have diverged) are measured.

Usage: JAX_PLATFORMS=cpu python tools/study_sample_groups.py [band_rows]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def primary_hits(v0, e1, e2, o, d, chunk=4096):
    """Chunked Möller-Trumbore closest hit (numpy oracle style) →
    (t [N], prim [N], live [N])."""
    n = len(o)
    t_out = np.full(n, np.inf, np.float32)
    p_out = np.full(n, -1, np.int64)
    for i in range(0, n, chunk):
        sl = slice(i, min(i + chunk, n))
        oc, dc = o[sl], d[sl]
        pvec = np.cross(dc[:, None, :], e2[None, :, :])
        det = np.einsum("mk,nmk->nm", e1, pvec)
        inv = np.where(np.abs(det) > 1e-12,
                       1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = oc[:, None, :] - v0[None, :, :]
        u = np.einsum("nmk,nmk->nm", tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("nk,nmk->nm", dc, qvec) * inv
        t = np.einsum("mk,nmk->nm", e2, qvec) * inv
        ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t > 1e-3) & (t < 1e16))
        t = np.where(ok, t, np.inf)
        pm = np.argmin(t, axis=1)
        tb = t[np.arange(len(oc)), pm]
        t_out[sl] = tb
        p_out[sl] = np.where(np.isfinite(tb), pm, -1)
    return t_out, p_out, p_out >= 0


def crossings(o, d, tmin, tmax, lo, hi):
    """Exact slab test → bool [N, C]. Matches the exact cull's per-ray
    logic (clusters.py _exact_cull_kernel)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    t0 = (lo[None] - o[:, None, :]) * inv[:, None, :]
    t1 = (hi[None] - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    live = (tmax > tmin)
    return (np.maximum(tn, tmin[:, None]) <= np.minimum(tf, tmax[:, None])) \
        & live[:, None]


def work(cross, live, rows_per_group=32, groups_per_block=8, label=""):
    """cross [N, C] with N divisible by 256 in (group-major) layout.
    Reports floor / gated / ungated pair-test rows per live ray."""
    n, c = cross.shape
    sub = rows_per_group * groups_per_block
    nb = n // sub
    g = cross.reshape(nb, groups_per_block, rows_per_group, c)
    gcross = g.any(axis=2)                       # [nb, G, C] group crossing
    bcross = gcross.any(axis=1)                  # [nb, C]    block list
    live_n = max(int(live.sum()), 1)
    floor = cross.sum() / live_n
    gated = gcross.sum(axis=1)[bcross].sum() * 0  # placeholder
    # gated work: for each listed cluster, each crossing group pays 32 rows
    gated_rows = (gcross.sum(axis=(1, 2)) * rows_per_group).sum() / live_n
    ungated_rows = (bcross.sum(axis=1) * sub).sum() / live_n
    print(f"  {label:34s} floor {floor:6.2f}  gated {gated_rows/32:6.2f} "
          f"(rows/ray {gated_rows:7.1f})  ungated {ungated_rows/32:6.2f} "
          f"xings-eq/ray   live {100.0*live_n/n:5.1f}%")
    return floor, gated_rows, ungated_rows


def cosine_dirs(n_vec, rng):
    u1 = rng.random(len(n_vec), dtype=np.float32)
    u2 = rng.random(len(n_vec), dtype=np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    local = np.stack([r * np.cos(phi), r * np.sin(phi),
                      np.sqrt(np.maximum(1 - u1, 0))], axis=1)
    # ONB around n
    nz = n_vec[:, 2]
    sign = np.where(nz >= 0, 1.0, -1.0).astype(np.float32)
    a = -1.0 / (sign + nz)
    b = n_vec[:, 0] * n_vec[:, 1] * a
    t = np.stack([1 + sign * n_vec[:, 0] ** 2 * a, sign * b,
                  -sign * n_vec[:, 0]], axis=1)
    bt = np.stack([b, sign + n_vec[:, 1] ** 2 * a, -n_vec[:, 1]], axis=1)
    return (local[:, 0:1] * t + local[:, 1:2] * bt
            + local[:, 2:3] * n_vec).astype(np.float32)


def main():
    import jax
    # The axon sitecustomize re-exports JAX_PLATFORMS=axon; a config
    # update (conftest-style) is the reliable way to pin this study to
    # the CPU backend even when the TPU tunnel is down.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from optix_raytracer_tpu.accel import clusters as cl, native
    from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
    from optix_raytracer_tpu.core.camera import generate_rays
    from optix_raytracer_tpu.core.rays import Rays
    from optix_raytracer_tpu.scene.builtins import knot_camera, trefoil_mesh

    band = int(sys.argv[1]) if len(sys.argv) > 1 else 104
    w, h = 1920, 1088
    verts, idx, normals = trefoil_mesh(200, 63)
    geom = build_triangle_geometry(verts, idx, normals=normals)
    cs = cl.build_clusters(geom, jnp.zeros((geom.num_triangles,), jnp.int32),
                           order=native.sah_leaf_order(geom))
    ab = np.asarray(cs.aabb.transpose(0, 2, 1).reshape(-1, 6))
    nc = cs.num_clusters
    lo, hi = ab[:nc, 0:3], ab[:nc, 3:6]
    v0 = np.asarray(geom.v0)
    e1, e2 = np.asarray(geom.e1), np.asarray(geom.e2)
    fn = np.asarray(geom.face_normal)
    print(f"knot: {geom.num_triangles} tris, {nc} clusters, "
          f"band rows {h//2 - band//2}..{h//2 + band//2}")

    # Full-density band of primary rays (the real sort is global, but a
    # contiguous band reproduces local key density).
    rays, _ = generate_rays(knot_camera(w, h).params(), w, h,
                            rng_state=None, jitter=False)
    y0 = h // 2 - band // 2
    o = np.asarray(rays.origin[y0:y0 + band]).reshape(-1, 3)
    d = np.asarray(rays.direction[y0:y0 + band]).reshape(-1, 3)
    n_rays = len(o)

    t0 = time.time()
    t_hit, prim, live = primary_hits(v0, e1, e2, o, d)
    print(f"primary hits: {live.mean()*100:.1f}% live "
          f"({time.time() - t0:.0f}s, {n_rays} rays)")

    hp = (o + d * np.where(live, t_hit, 0)[:, None]).astype(np.float32)
    nrm = fn[np.maximum(prim, 0)]
    nrm = nrm * np.where(np.einsum("nk,nk->n", nrm, d) > 0, -1, 1)[:, None]
    rng = np.random.default_rng(7)
    light_c = np.array([-1.5, 7.96, -1.5], np.float32)
    light_v1 = np.array([3.0, 0.0, 0.0], np.float32)
    light_v2 = np.array([0.0, 0.0, 3.0], np.float32)

    def shadow_rays(hpts, nrms, lv, rg):
        lp = (light_c + rg.random((len(hpts), 1), dtype=np.float32) * light_v1
              + rg.random((len(hpts), 1), dtype=np.float32) * light_v2)
        delta = lp - hpts
        dist = np.linalg.norm(delta, axis=1)
        sd = delta / np.maximum(dist, 1e-9)[:, None]
        so = hpts + nrms * 1e-3
        stmin = np.full(len(hpts), 1e-3, np.float32)
        stmax = np.where(lv, dist * 0.999, 0.0).astype(np.float32)
        return so, sd, stmin, stmax

    # ---------------- scheme A: current (sorted strangers) ----------------
    print("\nscheme A — 1 spl, coherence-sorted 32-groups of strangers:")
    bd = cosine_dirs(nrm, rng)
    btmin = np.full(n_rays, 1e-3, np.float32)
    btmax = np.where(live, 1e16, 0.0).astype(np.float32)
    bo = hp + nrm * 1e-3
    key = np.asarray(cl.coherence_key(cs, Rays(
        origin=jnp.asarray(bo), direction=jnp.asarray(bd),
        tmin=jnp.asarray(btmin), tmax=jnp.asarray(btmax))))
    perm = np.argsort(key, kind="stable")
    pad = (-n_rays) % 256
    def padded(x, fill=0.0):
        return np.concatenate([x[perm], np.full((pad,) + x.shape[1:], fill,
                                                x.dtype)])
    ca = crossings(padded(bo), padded(bd), padded(btmin), padded(btmax),
                   lo, hi)
    work(ca, padded(btmax) > padded(btmin), label="bounce-1 closest")

    so, sd, stmin, stmax = shadow_rays(hp, nrm, live, rng)
    skey = np.asarray(cl.coherence_key(cs, Rays(
        origin=jnp.asarray(so), direction=jnp.asarray(sd),
        tmin=jnp.asarray(stmin), tmax=jnp.asarray(stmax))))
    sperm = np.argsort(skey, kind="stable")
    def spadded(x, fill=0.0):
        return np.concatenate([x[sperm], np.full((pad,) + x.shape[1:], fill,
                                                 x.dtype)])
    csh = crossings(spadded(so), spadded(sd), spadded(stmin), spadded(stmax),
                    lo, hi)
    work(csh, spadded(stmax) > spadded(stmin), label="bounce-1 NEE shadow")

    # bounce-2: trace bounce-1 rays, then fresh cosine dirs (subsample 4x
    # to bound the MT cost)
    sub = slice(0, n_rays, 4)
    t2, prim2, live2 = primary_hits(v0, e1, e2, bo[sub], bd[sub])
    live2 &= live[sub]
    hp2 = (bo[sub] + bd[sub] * np.where(live2, t2, 0)[:, None]).astype(
        np.float32)
    nrm2 = fn[np.maximum(prim2, 0)]
    nrm2 = nrm2 * np.where(
        np.einsum("nk,nk->n", nrm2, bd[sub]) > 0, -1, 1)[:, None]
    bd2 = cosine_dirs(nrm2, rng)
    bo2 = hp2 + nrm2 * 1e-3
    b2tmin = np.full(len(bo2), 1e-3, np.float32)
    b2tmax = np.where(live2, 1e16, 0.0).astype(np.float32)
    key2 = np.asarray(cl.coherence_key(cs, Rays(
        origin=jnp.asarray(bo2), direction=jnp.asarray(bd2),
        tmin=jnp.asarray(b2tmin), tmax=jnp.asarray(b2tmax))))
    perm2 = np.argsort(key2, kind="stable")
    pad2 = (-len(bo2)) % 256
    def p2(x, fill=0.0):
        return np.concatenate([x[perm2], np.full((pad2,) + x.shape[1:], fill,
                                                 x.dtype)])
    c2 = crossings(p2(bo2), p2(bd2), p2(b2tmin), p2(b2tmax), lo, hi)
    work(c2, p2(b2tmax) > p2(b2tmin), label="bounce-2 closest")

    # ---------------- scheme B: sample-major (32 spl per group) -----------
    print("\nscheme B — 32 spl of one pixel per 32-group, 8 px/block, "
          "NO sort:")
    npx = n_rays // 32          # same total ray count
    pix = rng.choice(n_rays, size=npx, replace=False)
    pix = pix[np.argsort(key[pix], kind="stable")]  # pixel-level sort only
    S = 32
    hpB = np.repeat(hp[pix], S, axis=0)
    nrmB = np.repeat(nrm[pix], S, axis=0)
    liveB = np.repeat(live[pix], S, axis=0)
    bdB = cosine_dirs(nrmB, rng)
    boB = hpB + nrmB * 1e-3
    tminB = np.full(len(boB), 1e-3, np.float32)
    tmaxB = np.where(liveB, 1e16, 0.0).astype(np.float32)
    cb = crossings(boB, bdB, tminB, tmaxB, lo, hi)
    work(cb, tmaxB > tminB, label="bounce-1 closest")

    soB, sdB, stminB, stmaxB = shadow_rays(hpB, nrmB, liveB, rng)
    cbs = crossings(soB, sdB, stminB, stmaxB, lo, hi)
    work(cbs, stmaxB > stminB, label="bounce-1 NEE shadow")

    # bounce-2 under B: each sample's own bounce-1 hit (paths diverged).
    subB = slice(0, len(boB), 4)
    t2B, prim2B, live2B = primary_hits(v0, e1, e2, boB[subB], bdB[subB])
    live2B &= liveB[subB]
    hp2B = (boB[subB] + bdB[subB]
            * np.where(live2B, t2B, 0)[:, None]).astype(np.float32)
    nrm2B = fn[np.maximum(prim2B, 0)]
    nrm2B = nrm2B * np.where(
        np.einsum("nk,nk->n", nrm2B, bdB[subB]) > 0, -1, 1)[:, None]
    bd2B = cosine_dirs(nrm2B, rng)
    bo2B = hp2B + nrm2B * 1e-3
    t2minB = np.full(len(bo2B), 1e-3, np.float32)
    t2maxB = np.where(live2B, 1e16, 0.0).astype(np.float32)
    # note: subsampling by 4 keeps 8 consecutive samples per pixel → the
    # group is 4 pixels x 8 samples; report with rows_per_group=8*4=32
    # unchanged (layout preserved: consecutive rows are same-pixel).
    c2B = crossings(bo2B, bd2B, t2minB, t2maxB, lo, hi)
    work(c2B, t2maxB > t2minB, label="bounce-2 closest (8 spl/px)")

    # and bounce-2 with a per-block re-sort INSIDE the sample-major pool
    key2B = np.asarray(cl.coherence_key(cs, Rays(
        origin=jnp.asarray(bo2B), direction=jnp.asarray(bd2B),
        tmin=jnp.asarray(t2minB), tmax=jnp.asarray(t2maxB))))
    perm2B = np.argsort(key2B, kind="stable")
    c2Bs = crossings(bo2B[perm2B], bd2B[perm2B], t2minB[perm2B],
                     t2maxB[perm2B], lo, hi)
    work(c2Bs, t2maxB[perm2B] > t2minB[perm2B],
         label="bounce-2 closest (re-sorted)")


if __name__ == "__main__":
    main()
