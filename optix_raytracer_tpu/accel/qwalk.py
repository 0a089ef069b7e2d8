"""Cluster-major queue traversal — the scattered-wavefront experiment.

The shipped cluster walk (accel/clusters.py) is ray-block-major: each
256-ray sub-block while-loops over its crossing-cluster list, gating pair
tests at 32-ray-group granularity. Its measured waste on incoherent bounce
wavefronts is the lock-step union: a 32-ray group pair-tests the union of
its members' crossings (~21 clusters/group) where the per-ray truth is
~5.5 (TODO.md work model). Gating finer than 32 rows inside that kernel
loses to scf conditional overhead (~25 cy/cond, measured round 3).

This module flips the loop structure instead of gating it: traversal
becomes a FLAT WORK LIST of (8-ray octet, cluster) pairs — the exact
octet-granularity crossings — sorted cluster-major and padded per cluster,
so the kernel is a pure pipelined grid with ZERO in-kernel loops or
conditionals:

  1. `_oct_cull`: exact per-ray slab cull emitting a 32-bit octet
     crossing mask per (256-ray block, cluster) — 8-row granularity,
     4x finer than the walk's group bits.
  2. Work-list build (pure XLA): expand mask bits to (octet, cluster)
     pairs, lay them out cluster-major with each cluster's run padded to
     ITEMS, so every grid step serves exactly one cluster.
  3. Ray marshaling: gather each work item's 8 packed ray rows into a
     dense [K*8, 8] array — the kernel streams it contiguously.
  4. Queue kernel: grid step s pair-tests ITEMS x 8 = 256 marshaled rays
     against cluster step_cluster[s] (one (256, 128) Woop tile — the same
     dense shape as the walk kernel's step, at 100% occupancy). The
     cluster block is fetched via a scalar-prefetch index map; consecutive
     steps of one run revisit the same block, so the pipeline skips the
     copy.
  5. Per-ray reduction (XLA): segment-OR (any-hit) / segment-argmin
     (closest) over the marshaled row ids.

Work at 8-row granularity is within ~1.5x of the per-ray floor, the grid
replaces every scalar fetch + while-loop + pl.when with pipelined DMA, and
the pair-test tiles stay (256, 128) dense. The cost is the marshaling
traffic (HBM round trip of the work list) — the A/B against the gated walk
(tools/profile_qwalk.py) decides which wins on scattered wavefronts.

Capacity: the work list is statically sized at `qf` items per live octet
(default 16; exact-cull means on the 25k-knot bounce wavefront are ~5-9).
Overflow is detected and reported (`queue_stats`); callers A/B-ing keep
sizes inside capacity. The traversal core role is `optixTrace`
(`include/optix_device.h:61`) on scattered wavefronts, where the driver
core is distribution-agnostic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.rays import Rays
from .clusters import (_BIG, _DEGEN_EPS, _pack_rays, _pair_test, GROUPS,
                       LANES, SUB, SUPER, ClusterSet)

OCT = 8          # rays per work-item octet (one f32 sublane tile)
ITEMS = 32       # work items per grid step -> (ITEMS*OCT, LANES) pair tile
ROWS = ITEMS * OCT               # 256 marshaled rays per grid step


# ---------------------------------------------------------------------------
# Stage 1: octet-granularity exact cull
# ---------------------------------------------------------------------------

def _oct_cull_kernel(rays_ref, aabb_ref, om_out):
    """Exact per-ray slab cull -> per-(block, cluster) 32-bit octet mask.

    Same slab math as clusters._exact_cull_kernel, but the crossing
    reduction runs at 8-row octets (bit j = some ray of rows 8j..8j+7
    crosses) instead of 32-row groups."""
    c_rows = aabb_ref.shape[0]
    for g in range(GROUPS):
        a = rays_ref[g * SUB:(g + 1) * SUB, :]           # (SUB, 8)
        tmin, tmax = a[:, 6:7], a[:, 7:8]
        live = tmax > tmin
        any_live = jnp.max(live.astype(jnp.float32))

        @pl.when(any_live == 0.0)
        def _(g=g):
            om_out[g:g + 1, :] = jnp.zeros((1, om_out.shape[1]), jnp.int32)

        @pl.when(any_live > 0.0)
        def _(g=g, a=a, tmin=tmin, tmax=tmax, live=live):
            invs = []
            for ax in range(3):
                d = a[:, 3 + ax:4 + ax]
                invs.append(jnp.where(
                    jnp.abs(d) > _DEGEN_EPS, 1.0 / d,
                    jnp.where(d < 0, -1e12, 1e12)))
            for cr in range(c_rows):
                ab = aabb_ref[cr]                        # (6, 128)
                tn = jnp.full((SUB, LANES), -_BIG, jnp.float32)
                tf = jnp.full((SUB, LANES), _BIG, jnp.float32)
                for ax in range(3):
                    o = a[:, ax:ax + 1]
                    t0 = (ab[ax:ax + 1, :] - o) * invs[ax]
                    t1 = (ab[ax + 3:ax + 4, :] - o) * invs[ax]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                cross = ((jnp.maximum(tn, tmin) <= jnp.minimum(tf, tmax))
                         & live)
                crossi = cross.astype(jnp.int32)
                om = jnp.zeros((1, LANES), jnp.int32)
                for j in range(SUB // OCT):
                    sub_any = jnp.max(crossi[j * OCT:(j + 1) * OCT, :],
                                      axis=0, keepdims=True)
                    om = om + (sub_any << j)
                om_out[g:g + 1, cr * LANES:(cr + 1) * LANES] = om


def _oct_cull(cl: ClusterSet, packed, n_blocks, c_pad, interpret=False):
    n_super = n_blocks // GROUPS
    om = pl.pallas_call(
        _oct_cull_kernel,
        grid=(n_super,),
        in_specs=[pl.BlockSpec((SUPER, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((GROUPS, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, c_pad), jnp.int32),
        interpret=interpret,
    )(packed, cl.aabb)
    return om


# ---------------------------------------------------------------------------
# Stage 2+3: work-list build + ray marshaling (pure XLA)
# ---------------------------------------------------------------------------

def _build_queue(om, n_clusters, n_padded, k_cap):
    """om: [n_blocks, c_pad] i32 octet crossing masks. Returns
    (steps [3, n_steps] i32 (rows: cluster id, out-block index, qrays
    block index — dead steps point at block 0 / the spill out column, so
    the pipeline's revisit logic skips their DMAs entirely),
    work_oct [k_cap] i32 (-1 = padding), overflow [] bool,
    n_items [] i32)."""
    n_blocks, c_pad = om.shape
    n_oct = n_padded // OCT                      # == n_blocks * (SUB//OCT)
    # [C, O] cluster-major crossing matrix
    bits = ((om[:, :, None] >> jnp.arange(32, dtype=jnp.int32)) & 1) != 0
    bits_cm = bits.transpose(1, 0, 2).reshape(c_pad, n_oct)
    bits_cm = bits_cm[:n_clusters]
    cnt_c = jnp.sum(bits_cm, axis=1, dtype=jnp.int32)        # [C]
    pad_c = -(-cnt_c // ITEMS) * ITEMS                       # run lengths
    base_c = jnp.cumsum(pad_c) - pad_c                       # run starts
    n_items = base_c[-1] + pad_c[-1]
    overflow = n_items > k_cap
    slot_in = jnp.cumsum(bits_cm.astype(jnp.int32), axis=1) - 1
    slot = (base_c[:, None] + slot_in).reshape(-1)
    octet = jnp.broadcast_to(
        jnp.arange(n_oct, dtype=jnp.int32)[None, :],
        (n_clusters, n_oct)).reshape(-1)
    ok = bits_cm.reshape(-1)
    work_oct = jnp.full((k_cap,), -1, jnp.int32).at[
        jnp.where(ok, slot, k_cap)].set(octet, mode="drop")
    # per-step indices: step s sits inside cluster c's padded run; steps
    # past n_items (the static capacity tail) are dead — they keep the
    # previous cluster/qrays block and write the spill out column, so
    # consecutive dead steps cost no DMA at all (revisit dedup).
    n_steps = k_cap // ITEMS
    run_end = jnp.cumsum(pad_c)                              # [C]
    sidx = jnp.arange(n_steps, dtype=jnp.int32)
    step_cluster = jnp.searchsorted(run_end, sidx * ITEMS,
                                    side="right").astype(jnp.int32)
    step_cluster = jnp.minimum(step_cluster, n_clusters - 1)
    live = sidx * ITEMS < n_items
    step_out = jnp.where(live, sidx, n_steps)                # spill col
    step_q = jnp.where(live, sidx, 0)
    steps = jnp.stack([step_cluster, step_out, step_q])
    return steps, work_oct, overflow, n_items


def _marshal(packed, work_oct, n_padded):
    """Gather each work item's 8 packed ray rows -> ([8, k*8] f32 PLANAR
    rays (components on sublanes — the [k*8, 8] layout would lane-pad
    8 -> 128 = 16x HBM expansion), [k*8] i32 source row ids; padding rows
    get an empty window and the drop id n_padded)."""
    k_cap = work_oct.shape[0]
    octs = packed.reshape(n_padded // OCT, OCT, 8)
    dead = work_oct < 0
    q = octs[jnp.clip(work_oct, 0, octs.shape[0] - 1)]       # [K, 8, 8]
    # empty window: tmax = tmin - 1 < tmin kills every pair test
    q = q.at[:, :, 7].set(jnp.where(dead[:, None], q[:, :, 6] - 1.0,
                                    q[:, :, 7]))
    qrow = jnp.where(dead[:, None], n_padded,
                     work_oct[:, None] * OCT
                     + jnp.arange(OCT, dtype=jnp.int32)[None, :])
    return (q.reshape(k_cap * OCT, 8).T, qrow.reshape(k_cap * OCT))


# ---------------------------------------------------------------------------
# Stage 4: queue kernels
# ---------------------------------------------------------------------------

def _planar_comps(a):
    """(8, ROWS) planar block -> eight (ROWS, LANES) broadcasts. One
    sublane<->lane transpose per component (the planar HBM layout is what
    keeps marshaling pad-free; the transpose is per-step VMEM work)."""
    return [jnp.broadcast_to(jnp.transpose(a[j:j + 1, :], (1, 0)),
                             (ROWS, LANES)) for j in range(8)]


def _q_any_kernel(sc_ref, qrays_ref, comp_ref, out_ref):
    # Steps past the real item count (static-capacity tail) skip compute
    # entirely; their spill-column output is discarded by the caller.
    live = sc_ref[1, pl.program_id(0)] < pl.num_programs(0)

    @pl.when(live)
    def _():
        blk = comp_ref[0]                                    # (32, 128)
        ox, oy, oz, dx, dy, dz, tmin, tmax = _planar_comps(qrays_ref[...])
        tt, uu, vv, dpz = _pair_test(blk, ox, oy, oz, dx, dy, dz)
        real = blk[16:17, :] >= 0.0              # padding slots: prim id -1
        ok = ((jnp.abs(dpz) > _DEGEN_EPS)
              & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > tmin) & (tt < tmax) & real)
        occ = jnp.max(ok.astype(jnp.float32), axis=1,
                      keepdims=True)                         # (ROWS, 1)
        out_ref[...] = jnp.transpose(occ, (1, 0))            # (1, ROWS)


def _q_closest_kernel(sc_ref, qrays_ref, comp_ref, out_ref):
    """Per-step lane reduction -> (8, ROWS) candidate rows: t u v nx ny nz
    prim mat (t = tmax where no lane hit; prim = -1)."""
    live = sc_ref[1, pl.program_id(0)] < pl.num_programs(0)

    @pl.when(live)
    def _():
        blk = comp_ref[0]
        ox, oy, oz, dx, dy, dz, tmin, tmax = _planar_comps(qrays_ref[...])
        tt, uu, vv, dpz = _pair_test(blk, ox, oy, oz, dx, dy, dz)
        real = blk[16:17, :] >= 0.0
        ok = ((jnp.abs(dpz) > _DEGEN_EPS)
              & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > tmin) & (tt < tmax) & real)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        ttm = jnp.where(ok, tt, _BIG)
        row_t = jnp.min(ttm, axis=1, keepdims=True)          # (ROWS, 1)
        winner = (ttm == row_t) & ok
        win_lane = jnp.min(jnp.where(winner, lane, LANES), axis=1,
                           keepdims=True)
        sel = winner & (lane == win_lane)

        def pick(x):
            return jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)

        hit = row_t < _BIG
        uu_w, vv_w = pick(uu), pick(vv)
        out = jnp.concatenate([
            jnp.where(hit, row_t, tmax[:, 0:1]),
            uu_w, vv_w,
            pick(blk[18:19, :] + uu * blk[21:22, :] + vv * blk[24:25, :]),
            pick(blk[19:20, :] + uu * blk[22:23, :] + vv * blk[25:26, :]),
            pick(blk[20:21, :] + uu * blk[23:24, :] + vv * blk[26:27, :]),
            jnp.where(hit, pick(blk[16:17, :]), -1.0),
            jnp.where(hit, pick(blk[17:18, :]), -1.0),
        ], axis=1)                                           # (ROWS, 8)
        out_ref[...] = jnp.transpose(out, (1, 0))            # (8, ROWS)


def _run_queue(kernel, out_rows, cl, steps, qrays, interpret):
    """steps: [3, n_steps] i32 (cluster id, out col, qrays col). The out
    array carries one spill column past n_steps for dead steps; callers
    slice [:, :n_steps * ROWS]."""
    n_steps = steps.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((8, ROWS), lambda i, sc: (0, sc[2, i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, LANES), lambda i, sc: (sc[0, i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, ROWS), lambda i, sc: (0, sc[1, i]),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, (n_steps + 1) * ROWS),
                                       jnp.float32),
        interpret=interpret,
    )(steps, qrays, cl.comp)
    return out[:, :n_steps * ROWS]


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def _prep(cl: ClusterSet, rays: Rays, qf: int):
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    packed = _pack_rays(rays, n_padded)
    n_blocks = n_padded // SUB
    c_pad = cl.aabb.shape[0] * LANES
    k_cap = max(ITEMS, (qf * (n_padded // OCT) // ITEMS) * ITEMS)
    return n, n_padded, packed, n_blocks, c_pad, k_cap


@functools.partial(jax.jit, static_argnames=("interpret", "qf"))
def any_hit(cl: ClusterSet, rays: Rays, interpret: bool = False,
            qf: int = 6):
    """Occlusion via the cluster-major queue -> bool [N].

    Capacity overflow (work list larger than qf items/octet) falls back
    to the shipped gated walk via lax.cond — correct at any size, paid
    only when it happens."""
    from . import clusters as cluster_mod

    n, n_padded, packed, n_blocks, c_pad, k_cap = _prep(cl, rays, qf)
    om = _oct_cull(cl, packed, n_blocks, c_pad, interpret)
    steps, work_oct, overflow, _ = _build_queue(
        om, cl.num_clusters, n_padded, k_cap)
    qrays, qrow = _marshal(packed, work_oct, n_padded)
    occ = _run_queue(_q_any_kernel, 1, cl, steps, qrays, interpret)
    acc = jax.ops.segment_max(occ[0], qrow, num_segments=n_padded + 1,
                              indices_are_sorted=False)
    return jax.lax.cond(
        overflow,
        lambda: cluster_mod.any_hit(cl, rays, interpret=interpret,
                                    exact=True),
        lambda: acc[:n] > 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "qf"))
def closest_hit(cl: ClusterSet, rays: Rays, interpret: bool = False,
                qf: int = 6):
    """Closest hit via the cluster-major queue -> Hits [N]."""
    from .clusters import _hits_from_rows
    from . import clusters as cluster_mod

    n, n_padded, packed, n_blocks, c_pad, k_cap = _prep(cl, rays, qf)
    om = _oct_cull(cl, packed, n_blocks, c_pad, interpret)
    steps, work_oct, overflow, _ = _build_queue(
        om, cl.num_clusters, n_padded, k_cap)
    qrays, qrow = _marshal(packed, work_oct, n_padded)
    cand = _run_queue(_q_closest_kernel, 8, cl, steps, qrays,
                      interpret)                             # (8, K*8)
    # Segmented argmin by source ray: min t among hit rows, row index as
    # the deterministic tie-break, then one unique-index scatter of the
    # winner's 8 fields.
    keys = jnp.where(cand[6] >= 0.0, cand[0], _BIG)          # miss -> BIG
    tbest = jax.ops.segment_min(keys, qrow, num_segments=n_padded + 1)
    is_best = (keys == tbest[qrow]) & (keys < _BIG)
    ridx = jnp.arange(keys.shape[0], dtype=jnp.int32)
    rbest = jax.ops.segment_min(
        jnp.where(is_best, ridx, jnp.int32(2 ** 31 - 1)),
        qrow, num_segments=n_padded + 1)
    win = is_best & (ridx == rbest[qrow])
    tgt = jnp.where(win, qrow, n_padded)                     # dump slot
    init = jnp.zeros((8, n_padded + 1), jnp.float32)
    init = init.at[6].set(-1.0).at[7].set(-1.0)              # default miss
    rows = init.at[:, tgt].set(jnp.where(win[None, :], cand, -1.0),
                               mode="drop")
    # rays with no winning row keep the miss default; for them
    # _hits_from_rows substitutes t = tmax (prim < 0).
    tmax_pad = jnp.pad(rays.tmax, (0, n_padded - n))
    live = jnp.ones((n_padded,), bool)
    hits = _hits_from_rows(rows[:, :n_padded].T, live, tmax_pad)
    hits = jax.tree.map(lambda a: a[:n], hits)
    return jax.lax.cond(
        overflow,
        lambda: cluster_mod.closest_hit(cl, rays, interpret=interpret,
                                        exact=True),
        lambda: hits)


def queue_stats(cl: ClusterSet, rays: Rays, qf: int = 6,
                interpret: bool = False):
    """Work-list statistics for the design study: items, per-octet mean,
    capacity, overflow."""
    n, n_padded, packed, n_blocks, c_pad, k_cap = _prep(cl, rays, qf)
    om = _oct_cull(cl, packed, n_blocks, c_pad, interpret)
    _, _, overflow, n_items = _build_queue(om, cl.num_clusters, n_padded,
                                           k_cap)
    live = jnp.sum((rays.tmax > rays.tmin).astype(jnp.int32))
    return dict(n_items=int(n_items), k_cap=int(k_cap),
                overflow=bool(overflow), n_rays=int(n),
                live_rays=int(live),
                items_per_live_octet=float(n_items)
                / max(float(live) / OCT, 1.0))
