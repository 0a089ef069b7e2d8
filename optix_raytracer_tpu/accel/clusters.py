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
131k triangles); up to MAX_STREAM_CLUSTERS (1M triangles) the walk
switches to the HBM-streaming kernels — the cluster table stays in HBM
and each listed cluster is DMA'd into a double-buffered VMEM scratch,
prefetching cluster k+1 behind cluster k's pair test. Beyond that the
XLA LBVH traversal takes over.
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
GROUP_ROWS = 32             # rays per walk-gating sub-group (8 per block):
                            # the exact cull emits per-group crossing bits
                            # and the walk pair-tests only crossing groups.
                            # Measured on the 25k-knot diffuse-bounce
                            # wavefront: 3.52 of 8 groups cross a listed
                            # cluster -> 0.44x pair-test work (vs 0.55x at
                            # 64-row groups); per-ray crossings mean 5.5 vs
                            # 48.7 per 256-block union, so group gating
                            # recovers ~2.3x of the 8.9x lock-step waste.
GROUPS = 16                 # sub-blocks per grid step
SUPER = SUB * GROUPS        # rays per grid step
MAX_CLUSTERS = 1024         # VMEM-resident cluster cap (131k triangles)
MAX_STREAM_CLUSTERS = 8192  # per-cluster HBM-streaming cap (1M triangles;
                            # bounded by SMEM list bytes + the 13 low key
                            # bits of the cull's packed sort)
NBUF = 4                    # streaming DMA ring: cluster k+3 is issued
                            # while k is pair-tested — one 16 KB copy in
                            # flight is latency-bound, not bandwidth-bound
SC_CLUSTERS = 32            # clusters per SUPERCLUSTER (4096 triangles):
                            # the coarse tier that lifts the per-cluster
                            # list caps — cull and work lists run at
                            # supercluster granularity, the walk DMAs one
                            # whole supercluster (512 KB contiguous) and
                            # pair-tests only members whose AABBs cross
MAX_SUPERCLUSTERS = 1024    # supercluster-tier cap: 4.19M triangles
NBUF_SC = 2                 # supercluster DMA ring (2 x 512 KB VMEM)

_DEGEN_EPS = 1e-12
_BIG = 3.0e38


@struct.dataclass
class ClusterSet:
    """Triangle clusters in pair-test layout.

    comp:      [C, 32, 128] f32 — per-slot constants as rows:
               0-8 m_inv, 9-11 offset, 12-14 unit face normal, 15 pad,
               16 original prim id (f32, exact below 2^24; -1 = padding),
               17 material id (f32), 18-20 corner-0 shading normal,
               21-23 corner-1 minus corner-0, 24-26 corner-2 minus
               corner-0, 27-31 pad. Normals/ids are baked in so the
               kernel emits complete hits with ZERO XLA gathers — per-ray
               gathers cost more than the whole traversal; the shading
               normal is barycentric-interpolated IN-KERNEL (for unsmooth
               meshes the corner deltas are zero, so the emitted normal
               is exactly the face normal).
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
        return cls(comp=jnp.zeros((0, 32, LANES), jnp.float32),
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
    # Past the per-cluster streaming cap the supercluster tier walks the
    # comp table in SC_CLUSTERS-row slabs, so round the row count up (the
    # padding clusters are never-hit: zero comps, inverted AABBs).
    c_alloc = (-(-c // SC_CLUSTERS) * SC_CLUSTERS
               if c > MAX_STREAM_CLUSTERS else c)
    n_slots = c_alloc * LANES

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
    # Corner shading normals in (n0, n1-n0, n2-n0) form: the walk kernel
    # interpolates n = n0 + u*d10 + v*d20 per pair, so smooth meshes get
    # shading normals with zero epilogue gathers (the shading_frame role
    # for untextured scenes; `whitted.cu:160-168` normal interpolation).
    cn = geom.corner_normal[safe] * live[:, None, None]    # [n_slots, 3, 3]
    nrows = jnp.concatenate(
        [cn[:, 0], cn[:, 1] - cn[:, 0], cn[:, 2] - cn[:, 0]], axis=1)
    allc = jnp.concatenate(
        [consts, extra, nrows, jnp.zeros((n_slots, 5), jnp.float32)],
        axis=1)
    comp = allc.reshape(c_alloc, LANES, 32).transpose(0, 2, 1)

    # Cluster AABBs; padding slots contribute inverted boxes.
    lo = jnp.where(live[:, None] > 0, tri_lo[safe], _BIG)
    hi = jnp.where(live[:, None] > 0, tri_hi[safe], -_BIG)
    cl_lo = jnp.min(lo.reshape(c_alloc, LANES, 3), axis=1)  # [C, 3]
    cl_hi = jnp.max(hi.reshape(c_alloc, LANES, 3), axis=1)

    c_pad = c_rows * LANES
    cl_lo = jnp.concatenate(
        [cl_lo, jnp.full((c_pad - c_alloc, 3), _BIG, jnp.float32)])
    cl_hi = jnp.concatenate(
        [cl_hi, jnp.full((c_pad - c_alloc, 3), -_BIG, jnp.float32)])
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
# Stage 1: block-level culling (pure XLA)
# ---------------------------------------------------------------------------

def _exact_cull_kernel(rays_ref, aabb_ref, tn_out, gm_out):
    """EXACT per-ray slab cull, unioned per sub-block — Pallas.

    The interval cull below is conservative over a whole 256-ray bundle,
    and its looseness is the dominant traversal cost on SCATTERED rays:
    measured on the 25k-knot diffuse-bounce wavefront it lists ~60
    clusters per live block where the exact per-ray union is ~33, and on
    the NEE shadow wavefront ~42 where the exact union is ~9. Testing
    every (ray, cluster) pair exactly costs ~30 VPU ops per pair — for
    VMEM-resident scenes (<= 1024 clusters) that's far cheaper than
    walking the phantom clusters, and a whole-dead sub-block (every lane
    window empty — the terminated-path tail of a sorted bounce wavefront)
    skips all testing. Tile-coherent primaries keep the cheap interval
    cull (their lists are already ~2 clusters/block); callers pick per
    wavefront via the `exact` flag.

    rays_ref: (SUPER, 8) VMEM. aabb_ref: (c_rows, 6, 128) VMEM.
    tn_out: (GROUPS, c_pad) f32 — min entry distance over the block's
    crossing rays (a valid lower bound for the walk's front-to-back
    exit), _BIG where no ray in the block crosses the cluster.
    gm_out: (GROUPS, c_pad) i32 — bit g8 set iff some ray of the block's
    g8-th GROUP_ROWS-row sub-group crosses the cluster (the walk's
    group-gating mask; 0 exactly where tn_out is _BIG).
    """
    c_rows = aabb_ref.shape[0]
    for g in range(GROUPS):
        a = rays_ref[g * SUB:(g + 1) * SUB, :]           # (SUB, 8)
        tmin, tmax = a[:, 6:7], a[:, 7:8]                # (SUB, 1)
        live = tmax > tmin
        any_live = jnp.max(live.astype(jnp.float32))

        @pl.when(any_live == 0.0)
        def _(g=g):
            tn_out[g:g + 1, :] = jnp.full((1, tn_out.shape[1]), _BIG,
                                          jnp.float32)
            gm_out[g:g + 1, :] = jnp.zeros((1, gm_out.shape[1]), jnp.int32)

        @pl.when(any_live > 0.0)
        def _(g=g, a=a, tmin=tmin, tmax=tmax, live=live):
            # Finite pseudo-inverse for near-zero components: +-1e12
            # keeps products finite-or-inf (never NaN) and degenerates to
            # the correct inside-slab-pass behavior.
            invs = []
            for ax in range(3):
                d = a[:, 3 + ax:4 + ax]                  # (SUB, 1)
                invs.append(jnp.where(
                    jnp.abs(d) > _DEGEN_EPS, 1.0 / d,
                    jnp.where(d < 0, -1e12, 1e12)))
            for cr in range(c_rows):
                ab = aabb_ref[cr]                        # (6, 128)
                tn = jnp.full((SUB, LANES), -_BIG, jnp.float32)
                tf = jnp.full((SUB, LANES), _BIG, jnp.float32)
                for ax in range(3):
                    o = a[:, ax:ax + 1]                  # (SUB, 1)
                    t0 = (ab[ax:ax + 1, :] - o) * invs[ax]
                    t1 = (ab[ax + 3:ax + 4, :] - o) * invs[ax]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                cross = ((jnp.maximum(tn, tmin) <= jnp.minimum(tf, tmax))
                         & live)
                tnb = jnp.min(
                    jnp.where(cross, jnp.maximum(tn, 0.0), _BIG),
                    axis=0, keepdims=True)               # (1, 128)
                tn_out[g:g + 1, cr * LANES:(cr + 1) * LANES] = tnb
                crossi = cross.astype(jnp.int32)
                gm = jnp.zeros((1, LANES), jnp.int32)
                for g8 in range(SUB // GROUP_ROWS):
                    sub_any = jnp.max(
                        crossi[g8 * GROUP_ROWS:(g8 + 1) * GROUP_ROWS, :],
                        axis=0, keepdims=True)           # (1, 128)
                    gm = gm + (sub_any << g8)
                gm_out[g:g + 1, cr * LANES:(cr + 1) * LANES] = gm


def _exact_block_cull(cl: "ClusterSet", packed, n_blocks, c_pad,
                      interpret=False):
    """Run the exact per-ray cull kernel. Returns (mask [n_blocks, c_pad]
    bool, tnear [n_blocks, c_pad] f32, gmask [n_blocks, c_pad] i32)."""
    n_super = n_blocks // GROUPS
    out_spec = pl.BlockSpec((GROUPS, c_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tn, gm = pl.pallas_call(
        _exact_cull_kernel,
        grid=(n_super,),
        in_specs=[pl.BlockSpec((SUPER, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n_blocks, c_pad), jnp.float32),
                   jax.ShapeDtypeStruct((n_blocks, c_pad), jnp.int32)],
        interpret=interpret,
    )(packed, cl.aabb)
    mask = tn < _BIG
    return mask, jnp.where(mask, tn, 0.0), gm


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

def _step_closest(blk, ox, oy, oz, dx, dy, dz, tmin,
                  bt_s, bu_s, bv_s, bn_s, bid_s, r0=0, nrows=SUB):
    """Pair-test one cluster block (32, 128) and fold into the running-min
    hit scratch. The recorded normal is the barycentric-interpolated
    shading normal (face normal exactly, for unsmooth meshes — corner
    deltas are zero); the host epilogue normalizes.

    (r0, nrows) restricts the test to a static row range — the walk's
    group gating: rows whose 32-ray group doesn't cross the cluster
    (exact-cull mask bit clear) provably cannot hit any of its triangles,
    so their pair tests are skipped wholesale."""
    rows = slice(r0, r0 + nrows)
    tt, uu, vv, dpz = _pair_test(blk, ox[rows], oy[rows], oz[rows],
                                 dx[rows], dy[rows], dz[rows])
    bt = bt_s[rows]
    ok = ((jnp.abs(dpz) > _DEGEN_EPS)
          & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
          & (tt > tmin[rows]) & (tt < bt))  # per-lane running min
    bt_s[rows] = jnp.where(ok, tt, bt)
    bu_s[rows] = jnp.where(ok, uu, bu_s[rows])
    bv_s[rows] = jnp.where(ok, vv, bv_s[rows])
    for ax in range(3):
        n_interp = (blk[18 + ax:19 + ax, :]
                    + uu * blk[21 + ax:22 + ax, :]
                    + vv * blk[24 + ax:25 + ax, :])
        bn_s[ax, rows] = jnp.where(ok, n_interp, bn_s[ax, rows])
    bid_s[0, rows] = jnp.where(ok, blk[16:17, :], bid_s[0, rows])
    bid_s[1, rows] = jnp.where(ok, blk[17:18, :], bid_s[1, rows])


def _emit_closest(a, f_out, cols, bt_s, bu_s, bv_s, bn_s, bid_s):
    """Single lane-reduction: per-ray closest over the 128 lanes, written
    as one dense (8, SUB) column block."""
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
        return jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)

    any_hit_r = row_t < _BIG
    out = jnp.concatenate([
        jnp.where(any_hit_r, row_t, tmax1),
        pick(bu_s[...]), pick(bv_s[...]),
        pick(bn_s[0]), pick(bn_s[1]), pick(bn_s[2]),
        jnp.where(any_hit_r, pick(bid_s[0]), -1.0),
        jnp.where(any_hit_r, pick(bid_s[1]), -1.0),
    ], axis=1)                            # (SUB, 8)
    f_out[0:8, cols] = jnp.transpose(out, (1, 0))


def _closest_kernel(count_ref, list_ref, tnear_ref, comp_ref, rays_ref,
                    f_out, bt_s, bu_s, bv_s, bn_s, bid_s,
                    *, early_exit: bool, group_gate: bool = False):
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

            def step(entry):
                c = entry & 0xFFFF
                blk = comp_ref[pl.ds(c, 1)][0]    # (32, 128)
                if group_gate:
                    # Pair-test only the 32-ray groups whose exact-cull
                    # bit is set: a clear bit proves no ray of the group
                    # crosses the cluster AABB, so no triangle inside it
                    # can hit (bounce wavefronts: 3.52 of 8 groups mean).
                    gm = jax.lax.shift_right_logical(entry, 16)
                    for g8 in range(SUB // GROUP_ROWS):
                        bit = jax.lax.shift_right_logical(gm, g8) & 1

                        @pl.when(bit > 0)
                        def _(g8=g8):
                            _step_closest(blk, ox, oy, oz, dx, dy, dz,
                                          tmin, bt_s, bu_s, bv_s, bn_s,
                                          bid_s, r0=g8 * GROUP_ROWS,
                                          nrows=GROUP_ROWS)
                else:
                    _step_closest(blk, ox, oy, oz, dx, dy, dz, tmin,
                                  bt_s, bu_s, bv_s, bn_s, bid_s)

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

            _emit_closest(a, f_out, cols, bt_s, bu_s, bv_s, bn_s, bid_s)


def _closest_kernel_stream(count_ref, list_ref, tnear_ref, comp_hbm,
                           rays_ref, f_out, bt_s, bu_s, bv_s, bn_s, bid_s,
                           cbuf, sem, *, early_exit: bool):
    """HBM-streaming cluster walk: same hit semantics as _closest_kernel,
    but the cluster table stays in HBM and each listed cluster's (32, 128)
    block is DMA'd into a double-buffered VMEM scratch, prefetching
    cluster k+1 while k is pair-tested. This removes the VMEM residency
    cap (MAX_CLUSTERS) — the >131k-triangle role of the driver RT core
    (`include/optix_device.h:61` optixTrace on arbitrary GAS sizes)."""
    for g in range(GROUPS):
        a = rays_ref[g * SUB:(g + 1) * SUB, :]
        sub = _sub_rays(rays_ref, g)
        tmin = sub[6]
        count = count_ref[0, g, 0]
        cols = slice(g * SUB, (g + 1) * SUB)

        @pl.when(count > 0)
        def _(g=g, sub=sub, tmin=tmin, count=count, cols=cols, a=a):
            ox, oy, oz, dx, dy, dz = sub[0:6]
            bt_s[...] = sub[7]
            bid_s[0] = jnp.full((SUB, LANES), -1.0, jnp.float32)

            def dma(k):
                c = list_ref[0, g, k] & 0xFFFF
                return pltpu.make_async_copy(
                    comp_hbm.at[pl.ds(c, 1)],
                    cbuf.at[pl.ds(k % NBUF, 1)], sem.at[k % NBUF])

            for w in range(NBUF - 1):
                @pl.when(w < count)
                def _(w=w):
                    dma(jnp.int32(w)).start()

            def body(k):
                @pl.when(k + (NBUF - 1) < count)
                def _():
                    dma(k + (NBUF - 1)).start()
                dma(k).wait()
                blk = cbuf[pl.ds(k % NBUF, 1)][0]  # (32, 128)
                _step_closest(blk, ox, oy, oz, dx, dy, dz, tmin,
                              bt_s, bu_s, bv_s, bn_s, bid_s)
                return k + 1

            c_pad = list_ref.shape[2]

            def cond(k):
                tn = tnear_ref[0, g, jnp.minimum(k, c_pad - 1)]
                return (k < count) & (jnp.max(bt_s[...]) > tn)

            if early_exit:
                kf = jax.lax.while_loop(cond, body, jnp.int32(0))
            else:
                kf = jax.lax.while_loop(lambda k: k < count, body,
                                        jnp.int32(0))

            # Drain in-flight prefetches on early exit: an unawaited DMA
            # would leave its semaphore signaled and corrupt the next
            # group's first wait.
            for w in range(NBUF - 1):
                @pl.when(kf + w < count)
                def _(w=w):
                    dma(kf + w).wait()

            _emit_closest(a, f_out, cols, bt_s, bu_s, bv_s, bn_s, bid_s)


def _any_kernel_stream(count_ref, list_ref, tnear_ref, comp_hbm, rays_ref,
                       occ_out, occ_s, cbuf, sem):
    """Streaming occlusion walk (see _closest_kernel_stream)."""
    for g in range(GROUPS):
        count = count_ref[0, g, 0]
        cols = slice(g * SUB, (g + 1) * SUB)

        @pl.when(count > 0)
        def _(g=g, count=count, cols=cols):
            a = rays_ref[g * SUB:(g + 1) * SUB, :]
            ox, oy, oz, dx, dy, dz, tmin, tmax = _sub_rays(rays_ref, g)
            # Dead lanes (empty window) start "resolved" so the
            # all-occluded early exit only tracks live rays — without
            # this a single dead lane forces the full-list walk.
            dead = (a[:, 7:8] <= a[:, 6:7]).astype(jnp.int32)  # (SUB, 1)
            occ_s[...] = dead
            tmax_col = a[:, 7:8]
            c_pad = list_ref.shape[2]

            def dma(k):
                c = list_ref[0, g, k] & 0xFFFF
                return pltpu.make_async_copy(
                    comp_hbm.at[pl.ds(c, 1)],
                    cbuf.at[pl.ds(k % NBUF, 1)], sem.at[k % NBUF])

            for w in range(NBUF - 1):
                @pl.when(w < count)
                def _(w=w):
                    dma(jnp.int32(w)).start()

            def body(k):
                @pl.when(k + (NBUF - 1) < count)
                def _():
                    dma(k + (NBUF - 1)).start()
                dma(k).wait()
                blk = cbuf[pl.ds(k % NBUF, 1)][0]
                tt, uu, vv, dpz = _pair_test(blk, ox, oy, oz, dx, dy, dz)
                ok = ((jnp.abs(dpz) > _DEGEN_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > tmin) & (tt < tmax))
                occ_s[...] = jnp.maximum(
                    occ_s[...], jnp.max(ok.astype(jnp.int32), axis=1,
                                        keepdims=True))
                return k + 1

            def cond(k):
                tn = tnear_ref[0, g, jnp.minimum(k, c_pad - 1)]
                # Shrinking front-to-back bound over unresolved lanes (see
                # _any_kernel's cond).
                bound = jnp.max(jnp.where(occ_s[...] > 0, 0.0, tmax_col))
                return ((k < count) & (jnp.min(occ_s[...]) == 0)
                        & (tn <= bound))

            kf = jax.lax.while_loop(cond, body, jnp.int32(0))

            for w in range(NBUF - 1):
                @pl.when(kf + w < count)
                def _(w=w):
                    dma(kf + w).wait()

            # Dead lanes report unoccluded (their start-resolved marker is
            # an exit aid, not a hit).
            occ_out[0:1, cols] = jnp.transpose(
                occ_s[...] * (1 - dead), (1, 0))


def _any_kernel(count_ref, list_ref, tnear_ref, comp_ref, rays_ref,
                occ_out, occ_s, *, group_gate: bool = False):
    for g in range(GROUPS):
        count = count_ref[0, g, 0]
        cols = slice(g * SUB, (g + 1) * SUB)

        # Empty sub-blocks write nothing; the epilogue masks them clear.

        @pl.when(count > 0)
        def _(g=g, count=count, cols=cols):
            a = rays_ref[g * SUB:(g + 1) * SUB, :]
            ox, oy, oz, dx, dy, dz, tmin, tmax = _sub_rays(rays_ref, g)
            c_pad = list_ref.shape[2]
            # Dead lanes (empty window) start "resolved" so the
            # all-occluded early exit only tracks live rays.
            dead = (a[:, 7:8] <= a[:, 6:7]).astype(jnp.int32)  # (SUB, 1)
            occ_s[...] = dead

            def test_rows(blk, r0, nrows):
                rows = slice(r0, r0 + nrows)
                tt, uu, vv, dpz = _pair_test(blk, ox[rows], oy[rows],
                                             oz[rows], dx[rows], dy[rows],
                                             dz[rows])
                ok = ((jnp.abs(dpz) > _DEGEN_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > tmin[rows]) & (tt < tmax[rows]))
                occ_s[rows] = jnp.maximum(
                    occ_s[rows],
                    jnp.max(ok.astype(jnp.int32), axis=1, keepdims=True))

            def test(entry):
                blk = comp_ref[pl.ds(entry & 0xFFFF, 1)][0]
                if group_gate:
                    gm = jax.lax.shift_right_logical(entry, 16)
                    for g8 in range(SUB // GROUP_ROWS):
                        bit = jax.lax.shift_right_logical(gm, g8) & 1

                        @pl.when(bit > 0)
                        def _(g8=g8):
                            test_rows(blk, g8 * GROUP_ROWS, GROUP_ROWS)
                else:
                    test_rows(blk, 0, SUB)

            tmax_col = a[:, 7:8]

            def body(k):
                test(list_ref[0, g, k])
                test(list_ref[0, g, jnp.minimum(k + 1, c_pad - 1)])
                return k + 2

            def cond(k):
                tn = tnear_ref[0, g, jnp.minimum(k, c_pad - 1)]
                # Exit once every live ray is occluded, or no remaining
                # cluster can reach a still-unoccluded ray's window: the
                # front-to-back bound shrinks as lanes resolve (a lane is
                # resolved when occluded OR when tn passes its tmax), so
                # unoccluded shadow rays stop at the light, not the scene —
                # the terminate-on-first-hit role of the reference's
                # occlusion rays (`optixPathTracer.cu:394-400`).
                occ = occ_s[...]
                bound = jnp.max(jnp.where(occ > 0, 0.0, tmax_col))
                return (k < count) & (jnp.min(occ) == 0) & (tn <= bound)

            jax.lax.while_loop(cond, body, jnp.int32(0))
            occ_out[0:1, cols] = jnp.transpose(
                occ_s[...] * (1 - dead), (1, 0))


# ---------------------------------------------------------------------------
# Supercluster tier: >1M-triangle meshes
# ---------------------------------------------------------------------------
# The per-cluster streaming path is bounded by SMEM work-list bytes and the
# packed-sort id width at MAX_STREAM_CLUSTERS (1M triangles). Past that,
# culling and work lists move up one level: SC_CLUSTERS (32) consecutive
# clusters form a SUPERCLUSTER (4096 triangles), the block cull and
# front-to-back lists run over supercluster AABBs (<= 1024 lanes — same
# widths as the VMEM-resident tier), and the walk DMAs one whole
# supercluster (512 KB, contiguous) per list entry, slab-tests its 32
# member-cluster AABBs against the block in ONE vector op, and pair-tests
# only the crossing members. This is the arbitrary-GAS-size role of
# `optixAccelBuild` + the RT core (`Scene.cpp:817-1131` batched builds;
# `optix_device.h:61` optixTrace on any handle) for meshes to 4.19M
# triangles.


def _sc_tables(cl: ClusterSet):
    """Supercluster AABB tables, derived (pure jnp) from the cluster set:
    (cull_aabb [SC_rows, 6, 128] packed 128/lane row for the block cull,
    member_aabb [SC_pad, 6, 128] one supercluster per row with its 32
    member-cluster boxes on lanes 0..31, n_sc)."""
    ab = cl.aabb.transpose(0, 2, 1).reshape(-1, 6)        # [c_pad, 6]
    n_rows_comp = cl.comp.shape[0]                        # % SC_CLUSTERS == 0
    n_sc = n_rows_comp // SC_CLUSTERS
    mem = ab[:n_sc * SC_CLUSTERS].reshape(n_sc, SC_CLUSTERS, 6)
    sc_lo = jnp.min(mem[:, :, 0:3], axis=1)               # [n_sc, 3]
    sc_hi = jnp.max(mem[:, :, 3:6], axis=1)
    sc_rows = -(-n_sc // LANES)
    sc_pad = sc_rows * LANES
    lo = jnp.concatenate(
        [sc_lo, jnp.full((sc_pad - n_sc, 3), _BIG, jnp.float32)])
    hi = jnp.concatenate(
        [sc_hi, jnp.full((sc_pad - n_sc, 3), -_BIG, jnp.float32)])
    cull_aabb = jnp.concatenate([lo, hi], axis=1).reshape(
        sc_rows, LANES, 6).transpose(0, 2, 1)             # [SC_rows,6,128]

    # [n_sc, 6, 32] → pad lanes to 128 and rows to sc_pad with inverted
    # boxes (member pre-test then reports "no cross" for them).
    memT = mem.transpose(0, 2, 1)                         # [n_sc, 6, 32]
    inv_lane = jnp.concatenate(
        [jnp.full((n_sc, 3, LANES - SC_CLUSTERS), _BIG, jnp.float32),
         jnp.full((n_sc, 3, LANES - SC_CLUSTERS), -_BIG, jnp.float32)],
        axis=1)
    member = jnp.concatenate([memT, inv_lane], axis=2)    # [n_sc, 6, 128]
    inv_row = jnp.concatenate(
        [jnp.full((sc_pad - n_sc, 3, LANES), _BIG, jnp.float32),
         jnp.full((sc_pad - n_sc, 3, LANES), -_BIG, jnp.float32)], axis=1)
    member = jnp.concatenate([member, inv_row], axis=0)   # [sc_pad, 6, 128]
    return cull_aabb, member, n_sc


def _member_cross(a, ab):
    """Exact slab test of one supercluster's member-cluster AABBs (6, 128)
    against a sub-block's packed rays (SUB, 8) → bool (SUB, 128).

    KEEP IN LOCKSTEP with _exact_cull_kernel's inline slab test (same
    pseudo-inverse epsilon, ±1e12 degenerate fill, window-overlap rule):
    the cull and this member pre-test must agree on which clusters a ray
    crosses, or streamed superclusters would skip clusters the walk
    expects. Not factored into one helper because the two kernels carry
    different operand layouts ((SUB,8) rows here vs column planes there)
    and both are Mosaic-hot."""
    tmin, tmax = a[:, 6:7], a[:, 7:8]
    live = tmax > tmin
    tn = jnp.full((SUB, LANES), -_BIG, jnp.float32)
    tf = jnp.full((SUB, LANES), _BIG, jnp.float32)
    for ax in range(3):
        d = a[:, 3 + ax:4 + ax]
        inv = jnp.where(jnp.abs(d) > _DEGEN_EPS, 1.0 / d,
                        jnp.where(d < 0, -1e12, 1e12))
        o = a[:, ax:ax + 1]
        t0 = (ab[ax:ax + 1, :] - o) * inv
        t1 = (ab[ax + 3:ax + 4, :] - o) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return (jnp.maximum(tn, tmin) <= jnp.minimum(tf, tmax)) & live


def _member_bits(cross):
    """(SUB, 128) member-cross bools -> (mlo, mhi) int32 scalars with bit
    c (c+16) set when some ray crosses member c (< SC_CLUSTERS = 32). One
    cross-sublane max + two weighted lane reduces; the f32 sums are exact
    (each < 2^16, distinct powers of two)."""
    hv = jnp.max(cross.astype(jnp.float32), axis=0, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # clamp at SC_CLUSTERS: _member_cross lanes past the real member count
    # hold padding boxes (tests shrink SC_CLUSTERS below 16)
    w_lo = jnp.where(lane < min(16, SC_CLUSTERS),
                     jnp.exp2(lane.astype(jnp.float32)), 0.0)
    w_hi = jnp.where((lane >= 16) & (lane < SC_CLUSTERS),
                     jnp.exp2((lane - 16).astype(jnp.float32)), 0.0)
    mlo = jnp.sum(hv * w_lo).astype(jnp.int32)
    mhi = jnp.sum(hv * w_hi).astype(jnp.int32)
    return mlo, mhi


def _for_each_set_member(mlo, mhi, slot, cbuf, fn):
    """Run fn(member_block) for every set bit, ascending (lo half first —
    the same member order as a c-ascending scan). ~2.2 iterations on the
    measured 4M-tier distribution vs the 32 static scalar-gated
    conditionals of the previous body, whose scf.if chain alone cost
    ~10 us/step (tools/profile_sc.py round-5 work model)."""
    def body(st):
        lo, hi = st
        use_lo = lo > 0
        m = jnp.where(use_lo, lo, hi)
        low = m & (-m)
        # integer log2 of the isolated bit: 4 scalar mask-selects
        c = (jnp.where((low & 0xFF00) != 0, 8, 0)
             + jnp.where((low & 0xF0F0) != 0, 4, 0)
             + jnp.where((low & 0xCCCC) != 0, 2, 0)
             + jnp.where((low & 0xAAAA) != 0, 1, 0)
             + jnp.where(use_lo, 0, 16))
        fn(cbuf[pl.ds(slot * SC_CLUSTERS + c, 1)][0])
        m2 = m & (m - 1)
        return (jnp.where(use_lo, m2, lo), jnp.where(use_lo, hi, m2))

    jax.lax.while_loop(lambda st: (st[0] | st[1]) > 0, body, (mlo, mhi))


def _sc_closest_kernel(count_ref, list_ref, tnear_ref, comp_hbm, msc_ref,
                       rays_ref, f_out, bt_s, bu_s, bv_s, bn_s, bid_s,
                       cbuf, sem, *, early_exit: bool):
    """Supercluster streaming closest-hit walk (see tier comment above).

    Member gating (round-5, second fix): the round-4 body reduced the
    (SUB, 128) member-cross matrix 32 times (once per member, ~200 cy of
    cross-sublane tree each) — measured 10.3 us of overhead per
    (block, SC) step (tools/profile_sc.py), 86% of the 4M-tier walltime
    against a ~65 ms DMA+pair speed-of-light. Replacing the reduces with
    one axis-0 reduce + 32 scalar-gated conditionals recovered almost
    nothing (bench 6.0 -> 6.4 Mrays/s): the static scf.if chain costs as
    much as the reduces it replaced. This body walks only the ~2.2
    actually-crossing members: pack the member-hit row into two 16-bit
    scalars, then pop set bits in a data-dependent while loop
    (_for_each_set_member)."""
    c_pad = list_ref.shape[2]
    for g in range(GROUPS):
        a = rays_ref[g * SUB:(g + 1) * SUB, :]
        sub = _sub_rays(rays_ref, g)
        tmin = sub[6]
        count = count_ref[0, g, 0]
        cols = slice(g * SUB, (g + 1) * SUB)

        @pl.when(count > 0)
        def _(g=g, a=a, sub=sub, tmin=tmin, count=count, cols=cols):
            ox, oy, oz, dx, dy, dz = sub[0:6]
            bt_s[...] = sub[7]
            bid_s[0] = jnp.full((SUB, LANES), -1.0, jnp.float32)

            def dma(k):
                s = list_ref[0, g, k] & 0xFFFF
                slot = jax.lax.rem(k, NBUF_SC)
                return pltpu.make_async_copy(
                    comp_hbm.at[pl.ds(s * SC_CLUSTERS, SC_CLUSTERS)],
                    cbuf.at[pl.ds(slot * SC_CLUSTERS, SC_CLUSTERS)],
                    sem.at[slot])

            for w in range(NBUF_SC - 1):
                @pl.when(w < count)
                def _(w=w):
                    dma(jnp.int32(w)).start()

            def body(k):
                @pl.when(k + (NBUF_SC - 1) < count)
                def _():
                    dma(k + (NBUF_SC - 1)).start()
                dma(k).wait()
                s = list_ref[0, g, k] & 0xFFFF
                slot = jax.lax.rem(k, NBUF_SC)
                cross = _member_cross(a, msc_ref[pl.ds(s, 1)][0])
                mlo, mhi = _member_bits(cross)
                _for_each_set_member(
                    mlo, mhi, slot, cbuf,
                    lambda blk: _step_closest(blk, ox, oy, oz, dx, dy, dz,
                                              tmin, bt_s, bu_s, bv_s,
                                              bn_s, bid_s))
                return k + 1

            def cond(k):
                tn = tnear_ref[0, g, jnp.minimum(k, c_pad - 1)]
                return (k < count) & (jnp.max(bt_s[...]) > tn)

            if early_exit:
                kf = jax.lax.while_loop(cond, body, jnp.int32(0))
            else:
                kf = jax.lax.while_loop(lambda k: k < count, body,
                                        jnp.int32(0))
            for w in range(NBUF_SC - 1):
                @pl.when(kf + w < count)
                def _(w=w):
                    dma(kf + w).wait()
            _emit_closest(a, f_out, cols, bt_s, bu_s, bv_s, bn_s, bid_s)


def _sc_any_kernel(count_ref, list_ref, tnear_ref, comp_hbm, msc_ref,
                   rays_ref, occ_out, occ_s, cbuf, sem):
    """Supercluster streaming occlusion walk (same pop-set-bits member
    walk as _sc_closest_kernel)."""
    c_pad = list_ref.shape[2]
    for g in range(GROUPS):
        count = count_ref[0, g, 0]
        cols = slice(g * SUB, (g + 1) * SUB)

        @pl.when(count > 0)
        def _(g=g, count=count, cols=cols):
            a = rays_ref[g * SUB:(g + 1) * SUB, :]
            ox, oy, oz, dx, dy, dz, tmin, tmax = _sub_rays(rays_ref, g)
            dead = (a[:, 7:8] <= a[:, 6:7]).astype(jnp.int32)
            occ_s[...] = dead
            tmax_col = a[:, 7:8]

            def dma(k):
                s = list_ref[0, g, k] & 0xFFFF
                slot = jax.lax.rem(k, NBUF_SC)
                return pltpu.make_async_copy(
                    comp_hbm.at[pl.ds(s * SC_CLUSTERS, SC_CLUSTERS)],
                    cbuf.at[pl.ds(slot * SC_CLUSTERS, SC_CLUSTERS)],
                    sem.at[slot])

            for w in range(NBUF_SC - 1):
                @pl.when(w < count)
                def _(w=w):
                    dma(jnp.int32(w)).start()

            def body(k):
                @pl.when(k + (NBUF_SC - 1) < count)
                def _():
                    dma(k + (NBUF_SC - 1)).start()
                dma(k).wait()
                s = list_ref[0, g, k] & 0xFFFF
                slot = jax.lax.rem(k, NBUF_SC)
                cross = _member_cross(a, msc_ref[pl.ds(s, 1)][0])
                mlo, mhi = _member_bits(cross)

                def step_any(blk):
                    tt, uu, vv, dpz = _pair_test(blk, ox, oy, oz, dx, dy,
                                                 dz)
                    ok = ((jnp.abs(dpz) > _DEGEN_EPS)
                          & (uu >= 0.0) & (vv >= 0.0)
                          & (uu + vv <= 1.0)
                          & (tt > tmin) & (tt < tmax))
                    occ_s[...] = jnp.maximum(
                        occ_s[...],
                        jnp.max(ok.astype(jnp.int32), axis=1,
                                keepdims=True))

                _for_each_set_member(mlo, mhi, slot, cbuf, step_any)
                return k + 1

            def cond(k):
                tn = tnear_ref[0, g, jnp.minimum(k, c_pad - 1)]
                bound = jnp.max(jnp.where(occ_s[...] > 0, 0.0, tmax_col))
                return ((k < count) & (jnp.min(occ_s[...]) == 0)
                        & (tn <= bound))

            kf = jax.lax.while_loop(cond, body, jnp.int32(0))
            for w in range(NBUF_SC - 1):
                @pl.when(kf + w < count)
                def _(w=w):
                    dma(kf + w).wait()
            occ_out[0:1, cols] = jnp.transpose(
                occ_s[...] * (1 - dead), (1, 0))


def _sc_facade(cl: ClusterSet, cull_aabb, n_sc):
    """ClusterSet view whose 'clusters' are the superclusters — lets the
    existing cull/compaction stage run unchanged at the coarse tier."""
    return ClusterSet(comp=cl.comp[:0], aabb=cull_aabb,
                      slot_prim=cl.slot_prim[:0], num_clusters=n_sc)


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


def _cull(cl: ClusterSet, packed, n_super, c_pad, interpret, exact=False):
    """Run the block cull + compaction. Returns (counts [S, G, 1],
    lists [S, G, C_pad], tnear_sorted [S, G, C_pad]). List entries are
    PACKED: cluster id in bits 0-15, the walk's 8-bit group-gating mask
    in bits 16-23 (all-groups 0xFF when the cull has no per-group info).

    exact=True runs the per-ray slab cull — the right choice for
    scattered wavefronts (bounce/shadow rays), where interval looseness
    dominates the walk; coherent tile-ordered primaries keep the cheap
    interval cull (see _exact_cull_kernel's tradeoff note)."""
    gmask = None
    if exact and c_pad <= MAX_CLUSTERS:
        mask, tnear, gmask = _exact_block_cull(
            cl, packed, n_super * GROUPS, c_pad, interpret=interpret)
        gmask = gmask.reshape(n_super, GROUPS, c_pad)
    else:
        # Streaming regime: O(rays x clusters) exact testing is too much
        # at 4k+ clusters — the interval cull stays.
        mask, tnear = _block_cull(cl, packed, n_super * GROUPS, c_pad)
    mask = mask.reshape(n_super, GROUPS, c_pad)
    tnear = tnear.reshape(n_super, GROUPS, c_pad)

    # Compact each sub-block's hit clusters, front-to-back by entry
    # distance (misses sort to the tail at _BIG). One single-key sort:
    # the cluster id (and, on the exact path, the group mask) rides in
    # the low mantissa bits of the (non-negative) entry distance — f32
    # bit patterns of non-negative floats sort like their values, and
    # truncating the low mantissa bits only shifts the early-exit
    # threshold conservatively downward. 4x faster than argsort +
    # take_along_axis (gathers) on TPU.
    hit = mask & (jnp.arange(c_pad)[None, None, :] < cl.num_clusters)
    counts = jnp.sum(hit.astype(jnp.int32), axis=2, keepdims=True)
    key = jnp.maximum(jnp.where(hit, tnear, _BIG), 0.0)
    bits = jax.lax.bitcast_convert_type(key, jnp.int32)
    # id_bits = 10 up to the VMEM-resident cap, 13 for the HBM-streaming
    # range. With a group mask the low field is id_bits + 8 wide (18 max:
    # 5 mantissa bits + exponent still order front-to-back well enough
    # for the early exit, and the truncation stays conservative).
    id_bits = 10 if c_pad <= 1024 else 13
    assert c_pad <= (1 << id_bits), "cluster id must fit the low key bits"
    ids = jnp.arange(c_pad, dtype=jnp.int32)[None, None, :]
    if gmask is not None:
        low = ids | (jnp.where(hit, gmask, 0) << id_bits)
        low_bits = id_bits + 8
    else:
        low = ids
        low_bits = id_bits
    low_mask = jnp.int32((1 << low_bits) - 1)
    skey = jnp.sort((bits & ~low_mask) | low, axis=2)
    id_mask = jnp.int32((1 << id_bits) - 1)
    gm_sorted = (jax.lax.shift_right_logical(skey, id_bits) & 0xFF
                 if gmask is not None
                 else jnp.full_like(skey, 0xFF))
    order = (skey & id_mask) | (gm_sorted << 16)
    tnear_sorted = jax.lax.bitcast_convert_type(
        skey & ~low_mask, jnp.float32)
    return counts, order, tnear_sorted


def _group_walk_default() -> bool:
    """Walk-side group gating default: opt-in until a TPU session times
    it (ORT_GROUP_WALK=1). Gating is conservative-correct (interpret-mode
    parity tests) — the switch is purely a perf A/B."""
    import os
    return os.environ.get("ORT_GROUP_WALK", "0") == "1"


def _closest_core(cl: ClusterSet, packed, interpret, early_exit,
                  exact=False, group_walk=None):
    """Cull + walk over packed [n_padded, 8] rays → (fouts [8, n_padded],
    counts [n_super, GROUPS, 1]). Dispatches to the VMEM-resident kernel
    up to MAX_CLUSTERS and the HBM-streaming kernel beyond.

    group_walk gates the walk's pair tests per 32-ray group from the
    exact cull's crossing bits (only meaningful when exact=True on the
    VMEM-resident tier; None = ORT_GROUP_WALK env default)."""
    n_padded = packed.shape[0]
    n_super = n_padded // SUPER
    supercluster = cl.num_clusters > MAX_STREAM_CLUSTERS

    scratch = [pltpu.VMEM((SUB, LANES), jnp.float32),
               pltpu.VMEM((SUB, LANES), jnp.float32),
               pltpu.VMEM((SUB, LANES), jnp.float32),
               pltpu.VMEM((3, SUB, LANES), jnp.float32),
               pltpu.VMEM((2, SUB, LANES), jnp.float32)]
    extra_args = []
    if supercluster:
        cull_aabb, member_aabb, n_sc = _sc_tables(cl)
        assert n_sc <= MAX_SUPERCLUSTERS, (
            f"{n_sc} superclusters exceeds the cluster path's "
            f"{MAX_SUPERCLUSTERS * SC_CLUSTERS * LANES}-triangle capacity")
        c_pad = cull_aabb.shape[0] * LANES
        counts, lists, tnear_sorted = _cull(
            _sc_facade(cl, cull_aabb, n_sc), packed, n_super, c_pad,
            interpret, exact=exact)
        kernel = functools.partial(_sc_closest_kernel,
                                   early_exit=early_exit)
        comp_spec = [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        extra_args = [member_aabb]
        scratch += [pltpu.VMEM((NBUF_SC * SC_CLUSTERS, 32, LANES),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((NBUF_SC,))]
    else:
        c_pad = cl.num_rows * LANES
        counts, lists, tnear_sorted = _cull(cl, packed, n_super, c_pad,
                                            interpret, exact=exact)
        if cl.num_clusters > MAX_CLUSTERS:
            kernel = functools.partial(_closest_kernel_stream,
                                       early_exit=early_exit)
            comp_spec = [pl.BlockSpec(memory_space=pl.ANY)]
            scratch += [pltpu.VMEM((NBUF, 32, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((NBUF,))]
        else:
            if group_walk is None:
                group_walk = _group_walk_default()
            kernel = functools.partial(_closest_kernel,
                                       early_exit=early_exit,
                                       group_gate=exact and group_walk)
            comp_spec = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    smem3 = pl.BlockSpec((1, GROUPS, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
    fouts = pl.pallas_call(
        kernel,
        grid=(n_super,),
        in_specs=[pl.BlockSpec((1, GROUPS, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  smem3, smem3] + comp_spec
                 + [pl.BlockSpec((SUPER, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, SUPER), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_padded), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(counts, lists, tnear_sorted, cl.comp, *extra_args, packed)
    return fouts, counts


def _hits_from_rows(rows, live, tmax):
    """Build Hits from per-ray record rows [N, 8] + live mask [N].

    Rows belonging to empty sub-blocks are kernel garbage by design;
    `live` masks them."""
    t = rows[:, 0]
    u = rows[:, 1]
    v = rows[:, 2]
    # Interpolated shading normals are unnormalized in-kernel; one cheap
    # elementwise normalize here (no-op for unsmooth meshes' unit face
    # normals).
    normal = rows[:, 3:6]
    nlen = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    # Cancelling corner normals (norm ~ 0) stay zero rather than blowing
    # up — shading treats them as fully degenerate.
    normal = jnp.where(nlen > 1e-8, normal / jnp.maximum(nlen, 1e-12), 0.0)
    prim = jnp.where(live, rows[:, 6], -1.0).astype(jnp.int32)
    mat = jnp.where(live, rows[:, 7], -1.0).astype(jnp.int32)
    hit = prim >= 0
    hit3 = hit[:, None]
    return Hits(
        t=jnp.where(hit, t, tmax),
        prim_id=prim,
        inst_id=jnp.where(hit, 0, -1),
        mat_id=mat,
        uv=jnp.where(hit3, jnp.stack([u, v], axis=-1), 0.0),
        normal=jnp.where(hit3, normal, 0.0),
    )


@functools.partial(jax.jit,
                   static_argnames=("interpret", "early_exit", "exact",
                                    "group_walk"))
def closest_hit(cl: ClusterSet, rays: Rays, interpret: bool = False,
                early_exit: bool = True, exact: bool = False,
                group_walk=None) -> Hits:
    """Closest-hit query through the cluster structure → Hits (flat [N]).

    Normals and prim/material ids come straight from the cluster table
    (baked at build_clusters time) — no geometry access needed here.
    Pass exact=True for scattered (already-sorted) wavefronts."""
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    packed = _pack_rays(rays, n_padded)
    fouts, counts = _closest_core(cl, packed, interpret, early_exit,
                                  exact=exact, group_walk=group_walk)
    # Dense row reads — no gathers, no relayouts: the kernel already baked
    # normals and prim/material ids into the hit record.
    live = jnp.repeat(counts.reshape(-1) > 0, SUB)[:n]
    rows = fouts[:, :n].T
    return _hits_from_rows(rows, live, rays.tmax)


def coherence_key(cl: ClusterSet, rays: Rays,
                  okey_bits: int = 2, dkey_bits: int = 5):
    """[N] u32 sort key: origin-cell morton (major) | direction morton
    (minor). Direction bits dominate: the interval cull degrades fastest
    with direction spread (a cone near an axis zero makes the reciprocal
    interval unbounded). Swept on the 25k-knot diffuse-bounce wavefront:
    (2, 5) walks 56 clusters per live block vs 77 at (3, 4) and ~197 with
    direction-major keys — and origin bits past 2 or direction bits past
    5 measured no further gain (256-ray blocks saturate the resolution)."""
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
    key = (okey << jnp.uint32(3 * dkey_bits)) | dkey
    # Dead rays (empty [tmin, tmax) window — terminated/missed wavefront
    # lanes) sort to the tail: they pack into fully-dead blocks the cull
    # drops outright, so the walk only pays for live paths.
    return jnp.where(rays.tmax <= rays.tmin, jnp.uint32(0xFFFFFFFF), key)


def _sorted_perm(cl: ClusterSet, rays: Rays, n_padded):
    """Coherence permutation over the PADDED ray count (padding rays have
    an empty window so the dead-tail key sends them to the very end)."""
    n = rays.tmin.shape[0]
    key = coherence_key(cl, rays)
    key = jnp.concatenate(
        [key, jnp.full((n_padded - n,), 0xFFFFFFFF, jnp.uint32)])
    return jnp.argsort(key).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "early_exit",
                                             "group_walk"))
def closest_hit_sorted(cl: ClusterSet, rays: Rays, interpret: bool = False,
                       early_exit: bool = True, group_walk=None) -> Hits:
    """closest_hit with a coherence pre-sort — use for bounce/scattered
    rays; tile-ordered primaries should call closest_hit directly.

    Gather discipline: per-field [N] gathers dominate the sort cost on TPU
    (~5x the argsort itself), so rays travel through exactly ONE packed
    [N, 8] gather in and the hit records through ONE [N, 9] row scatter
    out."""
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    packed = _pack_rays(rays, n_padded)
    perm = _sorted_perm(cl, rays, n_padded)
    fouts, counts = _closest_core(cl, packed[perm], interpret, early_exit,
                                  exact=True, group_walk=group_walk)
    live = jnp.repeat(counts.reshape(-1) > 0, SUB)
    cols = jnp.concatenate(
        [fouts.T, live[:, None].astype(jnp.float32)], axis=1)  # [np, 9]
    back = jnp.zeros_like(cols).at[perm].set(cols)
    return _hits_from_rows(back[:n, :8], back[:n, 8] > 0.0, rays.tmax)


@functools.partial(jax.jit, static_argnames=("interpret", "group_walk"))
def any_hit_sorted(cl: ClusterSet, rays: Rays, interpret: bool = False,
                   group_walk=None):
    """any_hit with a coherence pre-sort (scattered shadow/AO rays)."""
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    packed = _pack_rays(rays, n_padded)
    perm = _sorted_perm(cl, rays, n_padded)
    occ = _any_core(cl, packed[perm], interpret, exact=True,
                    group_walk=group_walk)
    return occ[jnp.argsort(perm)][:n] != 0


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
    if cl.num_clusters > MAX_STREAM_CLUSTERS:
        # Supercluster tier: lists are superclusters of SC_CLUSTERS.
        cull_aabb, _, n_sc = _sc_tables(cl)
        counts, _, _ = _cull(_sc_facade(cl, cull_aabb, n_sc), packed,
                             n_padded // SUPER,
                             cull_aabb.shape[0] * LANES, interpret)
        tris_per_item = SC_CLUSTERS * LANES
    else:
        counts, _, _ = _cull(cl, packed, n_padded // SUPER,
                             cl.num_rows * LANES, interpret)
        tris_per_item = LANES
    c = np.asarray(counts).ravel().astype(np.float64)
    return {
        "mean_clusters_per_block": float(c.mean()),
        "max_clusters_per_block": float(c.max()),
        "mean_tris_tested_per_ray": float(c.mean() * tris_per_item),
        "empty_block_fraction": float((c == 0).mean()),
    }


def _any_core(cl: ClusterSet, packed, interpret, exact=False,
              group_walk=None):
    """Cull + occlusion walk over packed rays → i32 [n_padded] (0/1),
    empty-block live-masking already applied."""
    n_padded = packed.shape[0]
    n_super = n_padded // SUPER
    supercluster = cl.num_clusters > MAX_STREAM_CLUSTERS

    extra_args = []
    if supercluster:
        cull_aabb, member_aabb, n_sc = _sc_tables(cl)
        assert n_sc <= MAX_SUPERCLUSTERS
        c_pad = cull_aabb.shape[0] * LANES
        counts, lists, tnear_sorted = _cull(
            _sc_facade(cl, cull_aabb, n_sc), packed, n_super, c_pad,
            interpret, exact=exact)
        kernel = _sc_any_kernel
        comp_spec = [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        extra_args = [member_aabb]
        scratch = [pltpu.VMEM((SUB, 1), jnp.int32),
                   pltpu.VMEM((NBUF_SC * SC_CLUSTERS, 32, LANES),
                              jnp.float32),
                   pltpu.SemaphoreType.DMA((NBUF_SC,))]
    else:
        c_pad = cl.num_rows * LANES
        counts, lists, tnear_sorted = _cull(cl, packed, n_super, c_pad,
                                            interpret, exact=exact)
        if cl.num_clusters > MAX_CLUSTERS:
            kernel = _any_kernel_stream
            comp_spec = [pl.BlockSpec(memory_space=pl.ANY)]
            scratch = [pltpu.VMEM((SUB, 1), jnp.int32),
                       pltpu.VMEM((NBUF, 32, LANES), jnp.float32),
                       pltpu.SemaphoreType.DMA((NBUF,))]
        else:
            if group_walk is None:
                group_walk = _group_walk_default()
            kernel = functools.partial(_any_kernel,
                                       group_gate=exact and group_walk)
            comp_spec = [pl.BlockSpec(memory_space=pltpu.VMEM)]
            scratch = [pltpu.VMEM((SUB, 1), jnp.int32)]
    smem3 = pl.BlockSpec((1, GROUPS, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(n_super,),
        in_specs=[pl.BlockSpec((1, GROUPS, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  smem3, smem3] + comp_spec
                 + [pl.BlockSpec((SUPER, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUPER), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_padded), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(counts, lists, tnear_sorted, cl.comp, *extra_args, packed)

    live = jnp.repeat(counts.reshape(-1) > 0, SUB)
    return jnp.where(live, occ[0], 0)


@functools.partial(jax.jit, static_argnames=("interpret", "exact",
                                             "group_walk"))
def any_hit(cl: ClusterSet, rays: Rays, interpret: bool = False,
            exact: bool = False, group_walk=None):
    """Occlusion query through the cluster structure → bool [N].

    Pass exact=True for scattered or mixed-liveness wavefronts (NEE
    shadow rays): the exact cull's per-ray union lists ~4x fewer clusters
    than the interval cull there (see _exact_cull_kernel)."""
    n = rays.tmin.shape[0]
    n_padded = -(-n // SUPER) * SUPER
    packed = _pack_rays(rays, n_padded)
    return _any_core(cl, packed, interpret, exact=exact,
                     group_walk=group_walk)[:n] != 0
