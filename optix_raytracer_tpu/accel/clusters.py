"""Cluster-culled Pallas intersection — the large-mesh TPU traversal core.

This is the TPU-first replacement for the driver's RT-core traversal behind
`optixTrace` (`include/optix_device.h:61`) for meshes past the SMEM budget of
the brute-force kernel (accel/pallas_bf.py). A per-ray BVH descent is the
wrong shape for a vector machine — every step is a data-dependent gather and
the lock-step wavefront stalls on its slowest lane (accel/traverse.py, the
portable XLA fallback, is exactly that and is gather-bound). Instead:

1. **Clusters**: triangles are morton-sorted and chunked into clusters of
   128 — one cluster per vector register row. Each cluster's 16 Woop
   constants live in a `[C, 16, 128]` VMEM-resident table, so fetching a
   whole cluster is ONE dynamic slice: no scalar loads, no gathers.
2. **Cull kernel**: for each sub-block of SUB rays, slab-test every cluster
   AABB in pair layout (rays on sublanes × clusters on lanes) and emit a
   block hit mask plus the block-min entry distance per cluster.
3. **Work lists (XLA)**: each sub-block's hit clusters are compacted into
   a dense list sorted front-to-back by entry distance.
4. **Intersect kernel**: walks each sub-block's list; every step pair-tests
   all SUB x 128 ray/triangle combinations on full (SUB, 128) VPU tiles,
   carrying per-lane running-min hits; a single lane-reduction at the end
   produces the closest hit. Front-to-back order lets a sub-block exit as
   soon as no ray's best t can still improve.

Both kernels process SUPER = 4096 rays per grid step (16 sub-blocks,
statically unrolled) — small grid steps are dominated by per-step dispatch
overhead, and lane-padded (R, 1) buffers waste VMEM, so rays travel packed
as one dense [N, 8] array (o.xyz, d.xyz, tmin, tmax).

The per-(ray, triangle) test is identical math to accel/pallas_bf.py
(`_tri_test`), so hits match the brute-force and XLA paths bit-for-bit.

Capacity: clusters stay VMEM-resident up to MAX_CLUSTERS (1024 clusters =
131k triangles ~= 8.4 MB); larger meshes fall back to the XLA LBVH
traversal until the HBM-streaming variant lands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.rays import Hits, Rays
from .geometry import TriangleGeometry
from .morton import morton3d

LANES = 128                 # triangles per cluster (one vector row)
SUB = 256                   # rays per pair-test sub-block (sublane axis)
GROUPS = 16                 # sub-blocks per grid step
SUPER = SUB * GROUPS        # rays per grid step
MAX_CLUSTERS = 1024         # VMEM-resident cluster cap (131k triangles)

_DEGEN_EPS = 1e-12
_BIG = 3.0e38


@struct.dataclass
class ClusterSet:
    """Triangle clusters in pair-test layout.

    comp:      [C, 24, 128] f32 — per-slot constants as rows:
               0-8 m_inv, 9-11 offset, 12-14 unit face normal, 15 pad,
               16 original prim id (f32, exact below 2^24; -1 = padding),
               17 material id (f32), 18-23 pad. Normals/ids are baked in
               so the kernel emits complete hits with ZERO XLA gathers —
               per-ray gathers cost more than the whole traversal.
    aabb:      [C_rows, 6, 128] f32 — cluster AABBs, 128 clusters per row
               (rows: lox loy loz hix hiy hiz); padding clusters inverted
    slot_prim: [C*128] i32 — original triangle id per slot (-1 = padding)
    """
    comp: jnp.ndarray
    aabb: jnp.ndarray
    slot_prim: jnp.ndarray
    num_clusters: int = struct.field(pytree_node=False, default=0)

    @property
    def num_rows(self):
        return self.aabb.shape[0]

    @classmethod
    def empty(cls):
        return cls(comp=jnp.zeros((0, 24, LANES), jnp.float32),
                   aabb=jnp.zeros((0, 6, LANES), jnp.float32),
                   slot_prim=jnp.zeros((0,), jnp.int32),
                   num_clusters=0)


def build_clusters(geom: TriangleGeometry, tri_mat=None,
                   order=None) -> ClusterSet:
    """Chunk a mesh into 128-triangle clusters along a spatial order.

    tri_mat: optional [M] i32 material id per triangle (baked into the
    table so hits carry material ids without a gather).
    order: optional [M] i32 triangle permutation (e.g. SAH-tree leaf order);
    defaults to the morton order of AABB centroids. Pure jnp given a static
    triangle count, so dynamic-geometry rebuilds stay on device (the
    `optixAccelBuild` refit role, `optixDynamicGeometry.cpp:412-435`).
    """
    n = geom.num_triangles
    c = -(-n // LANES)
    c_rows = max(1, -(-c // LANES))
    n_slots = c * LANES

    v0, e1, e2 = geom.v0, geom.e1, geom.e2
    tri_lo = jnp.minimum(v0, jnp.minimum(v0 + e1, v0 + e2))
    tri_hi = jnp.maximum(v0, jnp.maximum(v0 + e1, v0 + e2))
    if order is None:
        centroid = 0.5 * (tri_lo + tri_hi)
        codes = morton3d(centroid, jnp.min(tri_lo, axis=0),
                         jnp.max(tri_hi, axis=0))
        order = jnp.argsort(codes).astype(jnp.int32)
    else:
        order = jnp.asarray(order, jnp.int32)

    pad = n_slots - n
    slot_prim = jnp.concatenate(
        [order, jnp.full((pad,), -1, jnp.int32)])
    safe = jnp.maximum(slot_prim, 0)
    live = (slot_prim >= 0).astype(jnp.float32)

    # Per-slot constants; padding slots zeroed => dpz == 0 => never hit.
    consts = geom.tri_consts[safe] * live[:, None]         # [n_slots, 16]
    mat = (tri_mat[safe] if tri_mat is not None
           else jnp.zeros((n_slots,), jnp.int32))
    extra = jnp.stack([
        slot_prim.astype(jnp.float32),
        jnp.where(slot_prim >= 0, mat.astype(jnp.float32), -1.0),
    ], axis=1)                                             # [n_slots, 2]
    allc = jnp.concatenate(
        [consts, extra, jnp.zeros((n_slots, 6), jnp.float32)], axis=1)
    comp = allc.reshape(c, LANES, 24).transpose(0, 2, 1)   # [C, 24, 128]

    # Cluster AABBs; padding slots contribute inverted boxes.
    lo = jnp.where(live[:, None] > 0, tri_lo[safe], _BIG)
    hi = jnp.where(live[:, None] > 0, tri_hi[safe], -_BIG)
    cl_lo = jnp.min(lo.reshape(c, LANES, 3), axis=1)        # [C, 3]
    cl_hi = jnp.max(hi.reshape(c, LANES, 3), axis=1)

    c_pad = c_rows * LANES
    cl_lo = jnp.concatenate(
        [cl_lo, jnp.full((c_pad - c, 3), _BIG, jnp.float32)])
    cl_hi = jnp.concatenate(
        [cl_hi, jnp.full((c_pad - c, 3), -_BIG, jnp.float32)])
    # [C_rows, 6, 128]: lox loy loz hix hiy hiz
    aabb = jnp.concatenate([cl_lo, cl_hi], axis=1)          # [c_pad, 6]
    aabb = aabb.reshape(c_rows, LANES, 6).transpose(0, 2, 1)

    return ClusterSet(comp=comp, aabb=aabb, slot_prim=slot_prim,
                      num_clusters=c)


def _sub_rays(rays_ref, g):
    """Broadcast sub-block g's 8 packed ray components to (SUB, 128)."""
    blk = rays_ref[g * SUB:(g + 1) * SUB, :]                # (SUB, 8)
    return [jnp.broadcast_to(blk[:, j:j + 1], (SUB, LANES)) for j in range(8)]


def _pair_test(blk, ox, oy, oz, dx, dy, dz):
    """Woop unit-triangle test: (SUB rays) x (128 cluster tris) per op.

    blk: one cluster's (16, 128) constant rows. Returns (tt, uu, vv, dpz).
    """
    opx = ox * blk[0:1, :] + oy * blk[1:2, :] + oz * blk[2:3, :] \
        + blk[9:10, :]
    opy = ox * blk[3:4, :] + oy * blk[4:5, :] + oz * blk[5:6, :] \
        + blk[10:11, :]
    opz = ox * blk[6:7, :] + oy * blk[7:8, :] + oz * blk[8:9, :] \
        + blk[11:12, :]
    dpx = dx * blk[0:1, :] + dy * blk[1:2, :] + dz * blk[2:3, :]
    dpy = dx * blk[3:4, :] + dy * blk[4:5, :] + dz * blk[5:6, :]
    dpz = dx * blk[6:7, :] + dy * blk[7:8, :] + dz * blk[8:9, :]
    inv = 1.0 / dpz
    tt = -opz * inv
    uu = opx + tt * dpx
    vv = opy + tt * dpy
    return tt, uu, vv, dpz


# ---------------------------------------------------------------------------
# Stage 1: block-level interval culling (pure XLA)
# ---------------------------------------------------------------------------

def _block_cull(cl: "ClusterSet", packed, n_blocks, c_pad):
    """Conservative per-(sub-block, cluster) slab test via interval
    arithmetic over the block's ray bundle — O(blocks x clusters) instead
    of O(rays x clusters).

    Per axis, with the block's origin interval [o_lo, o_hi] and a
    sign-consistent direction interval, the slab-plane crossing times form
    an interval; `L = max_axis(min_block tn_axis)` and
    `U = min_axis(max_block tf_axis)` satisfy `L <= A(r) <= B(r) <= U` for
    any truly hitting ray r (minimax inequality), so `L <= U` never culls
    a cluster some ray in the block would hit, and L is a valid lower
    bound on every ray's entry distance (used for front-to-back ordering
    and the walk kernel's early exit). Direction intervals spanning zero
    degenerate to "always hits" — exactly why bounce rays must be sorted
    into coherent blocks first (see sort_rays_for_coherence).

    Returns (mask [n_blocks, c_pad] bool, tnear [n_blocks, c_pad] f32).
    """
    blk = packed.reshape(n_blocks, SUB, 8)
    o_lo = jnp.min(blk[:, :, 0:3], axis=1)[:, None, :]   # [B, 1, 3]
    o_hi = jnp.max(blk[:, :, 0:3], axis=1)[:, None, :]
    d_lo = jnp.min(blk[:, :, 3:6], axis=1)[:, None, :]
    d_hi = jnp.max(blk[:, :, 3:6], axis=1)[:, None, :]
    tmin_lo = jnp.min(blk[:, :, 6], axis=1)[:, None]     # [B, 1]
    tmax_hi = jnp.max(blk[:, :, 7], axis=1)[:, None]

    # Cluster AABBs back to [c_pad, 3] corner layout.
    ab = cl.aabb.transpose(0, 2, 1).reshape(-1, 6)       # [c_pad, 6]
    lo = ab[None, :, 0:3]                                # [1, C, 3]
    hi = ab[None, :, 3:6]

    eps = _DEGEN_EPS
    consistent = (d_lo > eps) | (d_hi < -eps)            # [B, 1, 3]
    safe_lo = jnp.where(consistent, d_lo, 1.0)
    safe_hi = jnp.where(consistent, d_hi, 1.0)
    i_lo = 1.0 / safe_hi                                 # inv interval
    i_hi = 1.0 / safe_lo                                 # (i_lo <= i_hi)

    def plane_interval(p):
        # t = (p - o) * inv with a = p - o in [p - o_hi, p - o_lo]:
        # full 4-product interval multiply (signs of a and inv vary).
        a_lo = p - o_hi
        a_hi = p - o_lo
        p1, p2 = a_lo * i_lo, a_lo * i_hi
        p3, p4 = a_hi * i_lo, a_hi * i_hi
        t_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
        t_hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
        return t_lo, t_hi

    t0_lo, t0_hi = plane_interval(lo)                    # [B, C, 3]
    t1_lo, t1_hi = plane_interval(hi)
    tn_axis_lo = jnp.minimum(t0_lo, t1_lo)   # lower bound of per-ray tn
    tf_axis_hi = jnp.maximum(t0_hi, t1_hi)   # upper bound of per-ray tf
    tn_axis_lo = jnp.where(consistent, tn_axis_lo, -_BIG)
    tf_axis_hi = jnp.where(consistent, tf_axis_hi, _BIG)

    L = jnp.maximum(jnp.max(tn_axis_lo, axis=2), tmin_lo)  # [B, C]
    U = jnp.minimum(jnp.min(tf_axis_hi, axis=2), tmax_hi)
    mask = L <= U
    return mask, jnp.maximum(L, 0.0)


# ---------------------------------------------------------------------------
# Kernel 2: per-sub-block cluster walk, pair-test closest hit
# ---------------------------------------------------------------------------

def _closest_kernel(count_ref, list_ref, tnear_ref, comp_ref, rays_ref,
                    f_out, bt_s, bu_s, bv_s, bn_s, bid_s,
                    *, early_exit: bool):
    """Per-sub-block cluster walk emitting COMPLETE hits.

    Two hard-won TPU lessons shape this kernel:
    - Hit state lives in mutable VMEM scratch, NOT in while_loop carries —
      Mosaic copies every vector carry on each loop iteration.
    - The output is one dense transposed [8, N] array (rows: t u v nx ny
      nz prim mat, ids as exact f32) — lane-padded (N, 1) outputs relayout
      expensively, and per-ray XLA epilogue gathers for normals/ids cost
      more than the entire traversal, so everything is baked in-kernel.
    """
    c_pad = list_ref.shape[2]

    for g in range(GROUPS):
        a = rays_ref[g * SUB:(g + 1) * SUB, :]    # (SUB, 8)
        sub = _sub_rays(rays_ref, g)
        tmin, tmax = sub[6], sub[7]
        count = count_ref[0, g, 0]
        cols = slice(g * SUB, (g + 1) * SUB)

        # Empty sub-blocks write NOTHING — ~70% of blocks on a typical
        # framed mesh miss every cluster, and the (8, SUB) transpose+write
        # alone is a large share of an empty group's cost. The host-side
        # epilogue masks those rows to misses (closest_hit below).

        @pl.when(count > 0)
        def _(g=g, sub=sub, tmin=tmin, tmax=tmax, count=count, cols=cols,
              a=a):
            ox, oy, oz, dx, dy, dz = sub[0:6]
            # Only the running-min t and the hit-marker plane need init:
            # bu/bv/bn/bid[1] are written exactly where `ok`, and the
            # final pick masks by the winner select, so stale lanes from
            # the previous group never leak into the output.
            bt_s[...] = tmax
            bid_s[0] = jnp.full((SUB, LANES), -1.0, jnp.float32)

            def step(c):
                blk = comp_ref[pl.ds(c, 1)][0]    # (24, 128)
                tt, uu, vv, dpz = _pair_test(blk, ox, oy, oz, dx, dy, dz)
                bt = bt_s[...]
                ok = ((jnp.abs(dpz) > _DEGEN_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > tmin) & (tt < bt))  # per-lane running min
                bt_s[...] = jnp.where(ok, tt, bt)
                bu_s[...] = jnp.where(ok, uu, bu_s[...])
                bv_s[...] = jnp.where(ok, vv, bv_s[...])
                bn_s[0] = jnp.where(ok, blk[12:13, :], bn_s[0])
                bn_s[1] = jnp.where(ok, blk[13:14, :], bn_s[1])
                bn_s[2] = jnp.where(ok, blk[14:15, :], bn_s[2])
                bid_s[0] = jnp.where(ok, blk[16:17, :], bid_s[0])
                bid_s[1] = jnp.where(ok, blk[17:18, :], bid_s[1])

            # Two clusters per iteration: the loop-control + scalar-fetch
            # overhead is a large share of an iteration at these counts
            # (~2 clusters/block mean). The sorted tail past `count` holds
            # valid (merely unhit) cluster ids, so an odd count rounding up
            # wastes one cheap redundant test instead of needing a mask.
            def body(k):
                step(list_ref[0, g, k])
                step(list_ref[0, g, jnp.minimum(k + 1, c_pad - 1)])
                return k + 2

            def cond(k):
                # Front-to-back order: once no ray's best t exceeds the
                # entry distance of the next cluster, nothing can improve.
                tn = tnear_ref[0, g, jnp.minimum(k, c_pad - 1)]
                return (k < count) & (jnp.max(bt_s[...]) > tn)

            if early_exit:
                jax.lax.while_loop(cond, body, jnp.int32(0))
            else:
                jax.lax.while_loop(lambda k: k < count, body, jnp.int32(0))

            # Single lane-reduction: per-ray closest over the 128 lanes.
            bt = bt_s[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
            tmax1 = a[:, 7:8]                     # (SUB, 1)
            hit_lane = bid_s[0] >= 0.0
            ttm = jnp.where(hit_lane, bt, _BIG)
            row_t = jnp.min(ttm, axis=1, keepdims=True)
            winner = (ttm == row_t) & hit_lane
            win_lane = jnp.min(jnp.where(winner, lane, LANES), axis=1,
                               keepdims=True)
            sel = winner & (lane == win_lane)

            def pick(x):
                # where-mask (not multiply) so uninitialized loser lanes
                # (possibly NaN garbage) cannot poison the sum.
                return jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                               keepdims=True)

            any_hit_r = row_t < _BIG
            out = jnp.concatenate([
                jnp.where(any_hit_r, row_t, tmax1),
                pick(bu_s[...]), pick(bv_s[...]),
                pick(bn_s[0]), pick(bn_s[1]), pick(bn_s[2]),
                jnp.where(any_hit_r, pick(bid_s[0]), -1.0),
                jnp.where(any_hit_r, pick(bid_s[1]), -1.0),
            ], axis=1)                            # (SUB, 8)
            f_out[0:8, cols] = jnp.transpose(out, (1, 0))


def _any_kernel(count_ref, list_ref, comp_ref, rays_ref, occ_out):
    for g in range(GROUPS):
        count = count_ref[0, g, 0]
        cols = slice(g * SUB, (g + 1) * SUB)

        # Empty sub-blocks write nothing; the epilogue masks them clear.

        @pl.when(count > 0)
        def _(g=g, count=count, cols=cols):
            ox, oy, oz, dx, dy, dz, tmin, tmax = _sub_rays(rays_ref, g)
            c_pad = list_ref.shape[2]

            def test(c):
                blk = comp_ref[pl.ds(c, 1)][0]
                tt, uu, vv, dpz = _pair_test(blk, ox, oy, oz, dx, dy, dz)
                ok = ((jnp.abs(dpz) > _DEGEN_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > tmin) & (tt < tmax))
                return jnp.max(ok.astype(jnp.int32), axis=1, keepdims=True)

            def body(state):
                k, occ = state
                occ = jnp.maximum(occ, test(list_ref[0, g, k]))
                occ = jnp.maximum(
                    occ, test(list_ref[0, g, jnp.minimum(k + 1, c_pad - 1)]))
                return k + 2, occ

            def cond(state):
                k, occ = state
                # Exit once every ray in the sub-block is occluded.
                return (k < count) & (jnp.min(occ) == 0)

            _, occ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((SUB, 1), jnp.int32)))
            occ_out[0:1, cols] = jnp.transpose(occ, (1, 0))


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------

def _pack_rays(rays: Rays, n_padded):
    """Rays → dense [n_padded, 8] (ox oy oz dx dy dz tmin tmax).

    Padding rays get tmin = tmax = 0 => empty hit window => never hit."""
    packed = jnp.concatenate(
        [rays.origin, rays.direction, rays.tmin[:, None],
         rays.tmax[:, None]], axis=1)
    pad = n_padded - packed.shape[0]
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad, 8), jnp.float32)], axis=0)
    return packed


def _cull(cl: ClusterSet, packed, n_super, c_pad, interpret):
    """Run the block-interval cull + compaction. Returns (counts [S, G, 1],
    lists [S, G, C_pad], tnear_sorted [S, G, C_pad])."""
    del interpret  # pure XLA — interpret only affects the pallas kernels
    mask, tnear = _block_cull(cl, packed, n_super * GROUPS, c_pad)
    mask = mask.reshape(n_super, GROUPS, c_pad)
    tnear = tnear.reshape(n_super, GROUPS, c_pad)

    # Compact each sub-block's hit clusters, front-to-back by entry
    # distance (misses sort to the tail at _BIG). One single-key sort:
    # the cluster id rides in the low mantissa bits of the (non-negative)
    # entry distance — f32 bit patterns of non-negative floats sort like
    # their values, and truncating the low 10 mantissa bits only shifts
    # the early-exit threshold conservatively downward. 4x faster than
    # argsort + take_along_axis (gathers) on TPU.
    hit = mask & (jnp.arange(c_pad)[None, None, :] < cl.num_clusters)
    counts = jnp.sum(hit.astype(jnp.int32), axis=2, keepdims=True)
    key = jnp.maximum(jnp.where(hit, tnear, _BIG), 0.0)
    bits = jax.lax.bitcast_convert_type(key, jnp.int32)
    assert c_pad <= 1024, "cluster id must fit the low 10 key bits"
    packed_key = (bits & ~jnp.int32(0x3FF)) | jnp.arange(
        c_pad, dtype=jnp.int32)[None, None, :]
    skey = jnp.sort(packed_key, axis=2)
    order = skey & 0x3FF
    tnear_sorted = jax.lax.bitcast_convert_type(
        skey & ~jnp.int32(0x3FF), jnp.float32)
    return counts, order, tnear_sorted


@functools.partial(jax.jit, static_argnames=("interpret", "early_exit"))
def closest_hit(cl: ClusterSet, rays: Rays, interpret: bool = False,
                early_exit: bool = True) -> Hits:
    """Closest-hit query through the cluster structure → Hits (flat [N]).

    Normals and prim/material ids come straight from the cluster table
    (baked at build_clusters time) — no geometry access needed here."""
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    n_super = n_padded // SUPER
    c_pad = cl.num_rows * LANES
    packed = _pack_rays(rays, n_padded)

    counts, lists, tnear_sorted = _cull(cl, packed, n_super, c_pad,
                                        interpret)

    smem3 = pl.BlockSpec((1, GROUPS, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
    fouts = pl.pallas_call(
        functools.partial(_closest_kernel, early_exit=early_exit),
        grid=(n_super,),
        in_specs=[pl.BlockSpec((1, GROUPS, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  smem3, smem3,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((SUPER, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, SUPER), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_padded), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SUB, LANES), jnp.float32),
                        pltpu.VMEM((SUB, LANES), jnp.float32),
                        pltpu.VMEM((SUB, LANES), jnp.float32),
                        pltpu.VMEM((3, SUB, LANES), jnp.float32),
                        pltpu.VMEM((2, SUB, LANES), jnp.float32)],
        interpret=interpret,
    )(counts, lists, tnear_sorted, cl.comp, packed)

    # Dense row reads — no gathers, no relayouts: the kernel already baked
    # normals and prim/material ids into the hit record. Rows belonging to
    # empty sub-blocks are kernel garbage by design; `live` masks them.
    live = jnp.repeat(counts.reshape(-1) > 0, SUB)[:n]
    t = fouts[0, :n]
    u = fouts[1, :n]
    v = fouts[2, :n]
    normal = jnp.stack([fouts[3, :n], fouts[4, :n], fouts[5, :n]], axis=-1)
    prim = jnp.where(live, fouts[6, :n], -1.0).astype(jnp.int32)
    mat = jnp.where(live, fouts[7, :n], -1.0).astype(jnp.int32)
    hit = prim >= 0
    hit3 = hit[:, None]
    return Hits(
        t=jnp.where(hit, t, rays.tmax),
        prim_id=prim,
        inst_id=jnp.where(hit, 0, -1),
        mat_id=mat,
        uv=jnp.where(hit3, jnp.stack([u, v], axis=-1), 0.0),
        normal=jnp.where(hit3, normal, 0.0),
    )


def _coherence_perm(cl: ClusterSet, rays: Rays):
    """Permutation sorting rays into spatially coherent 256-ray blocks.

    The block-interval cull (and the walk's early exit) are only as tight
    as each block's (origin box x direction interval); bounce rays arrive
    scattered and an unsorted block degenerates to "walk every cluster"
    (~100x slower than tile-coherent primaries). Key layout, major to
    minor: 12-bit morton of the origin cell over the scene bounds, then a
    6-bit direction octant/cone (2 bits/axis — the top bit per axis IS the
    sign, so a block never mixes direction signs and the interval cull's
    reciprocal stays sign-consistent). This is the SER ray-reorder role of
    `optixReorder` (include/optix_device.h:184) done wavefront-style.
    """
    return jnp.argsort(coherence_key(cl, rays)).astype(jnp.int32)


def coherence_key(cl: ClusterSet, rays: Rays,
                  okey_bits: int = 3, dkey_bits: int = 4):
    """[N] u32 sort key: origin-cell morton (major) | direction morton
    (minor). More direction bits than origin bits: the interval cull
    degrades fastest with direction spread (a cone near an axis zero makes
    the reciprocal interval unbounded), while origins of one bounce
    wavefront already concentrate on visible surfaces."""
    from .morton import expand_bits

    ab = cl.aabb.transpose(0, 2, 1).reshape(-1, 6)
    real = jnp.arange(ab.shape[0]) < cl.num_clusters
    lo = jnp.min(jnp.where(real[:, None], ab[:, 0:3], _BIG), axis=0)
    hi = jnp.max(jnp.where(real[:, None], ab[:, 3:6], -_BIG), axis=0)

    def morton(points, bits):
        q = jnp.clip(points, 0.0, 1.0 - 1e-7)
        c = (q * (1 << bits)).astype(jnp.uint32)
        return ((expand_bits(c[:, 0]) << 2) | (expand_bits(c[:, 1]) << 1)
                | expand_bits(c[:, 2]))

    extent = jnp.maximum(hi - lo, 1e-12)
    okey = morton((rays.origin - lo) / extent, okey_bits)
    dkey = morton(rays.direction * 0.5 + 0.5, dkey_bits)
    return (okey << jnp.uint32(3 * dkey_bits)) | dkey


@functools.partial(jax.jit, static_argnames=("interpret", "early_exit"))
def closest_hit_sorted(cl: ClusterSet, rays: Rays, interpret: bool = False,
                       early_exit: bool = True) -> Hits:
    """closest_hit with a coherence pre-sort — use for bounce/scattered
    rays; tile-ordered primaries should call closest_hit directly (the
    sort costs ~a few ms that coherent rays don't earn back)."""
    perm = _coherence_perm(cl, rays)
    sorted_rays = jax.tree.map(lambda a: a[perm], rays)
    hits = closest_hit(cl, sorted_rays, interpret=interpret,
                       early_exit=early_exit)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32))
    return jax.tree.map(lambda a: a[inv], hits)


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit_sorted(cl: ClusterSet, rays: Rays, interpret: bool = False):
    """any_hit with a coherence pre-sort (scattered shadow/AO rays)."""
    perm = _coherence_perm(cl, rays)
    sorted_rays = jax.tree.map(lambda a: a[perm], rays)
    occ = any_hit(cl, sorted_rays, interpret=interpret)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32))
    return occ[inv]


def traversal_stats(cl: ClusterSet, rays: Rays, interpret: bool = False):
    """Traversal-work counters: how many clusters each 256-ray sub-block
    actually walks (the step-count telemetry that lets build-quality
    changes — SAH vs morton cluster order — be *measured*, per the
    round-1 verdict's quality-build item). Returns a dict of python
    floats."""
    import numpy as np
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    packed = _pack_rays(rays, n_padded)
    counts, _, _ = _cull(cl, packed, n_padded // SUPER,
                         cl.num_rows * LANES, interpret)
    c = np.asarray(counts).ravel().astype(np.float64)
    return {
        "mean_clusters_per_block": float(c.mean()),
        "max_clusters_per_block": float(c.max()),
        "mean_tris_tested_per_ray": float(c.mean() * LANES),
        "empty_block_fraction": float((c == 0).mean()),
    }


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit(cl: ClusterSet, rays: Rays, interpret: bool = False):
    """Occlusion query through the cluster structure → bool [N]."""
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    n_super = n_padded // SUPER
    c_pad = cl.num_rows * LANES
    packed = _pack_rays(rays, n_padded)

    counts, lists, _ = _cull(cl, packed, n_super, c_pad, interpret)

    occ = pl.pallas_call(
        _any_kernel,
        grid=(n_super,),
        in_specs=[pl.BlockSpec((1, GROUPS, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, GROUPS, c_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((SUPER, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUPER), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_padded), jnp.int32),
        interpret=interpret,
    )(counts, lists, cl.comp, packed)

    live = jnp.repeat(counts.reshape(-1) > 0, SUB)[:n]
    return live & (occ[0, :n] != 0)
