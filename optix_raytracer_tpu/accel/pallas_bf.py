"""Fused Pallas intersection kernels — the TPU "traversal core" hot path.

The pure-XLA brute-force intersector (accel/bruteforce.py) materializes
[N, 3M] intermediates in HBM, which makes the path tracer memory-bound
(~14 Mrays/s measured at 1080p). These kernels keep the whole ray×triangle
test in VMEM/registers:

- rays stream through VMEM as [8, 128]-blocks of SoA components (1024
  rays per grid step),
- per-triangle constants (the unit-triangle transform of accel/geometry.py,
  plus face normal) sit in SMEM and are broadcast scalar-by-scalar,
- the closest-hit reduction is a running min carried in registers across a
  `fori_loop` over triangles, emitting hit t/u/v/prim/material/normal directly
  — so the shading stage needs no gathers at all.

HBM traffic: 32 B/ray in, 36 B/ray out — ~100× less than the XLA path.
This is the `optixTrace` equivalent (`include/optix_device.h:61`) for
small-to-medium GAS sizes; the LBVH path handles large scenes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.rays import Rays

LANES = 128
# 32 sublanes (4096 rays/block) measured fastest on v5e: 1024→305, 2048→506,
# 4096→645, 8192→624 Mrays/s on the Cornell bench — bigger blocks amortize
# the per-triangle scalar loads across more vector work until VMEM pressure
# turns over.
SUBLANES = 32
BLOCK_RAYS = SUBLANES * LANES           # rays per grid step
MAX_SMEM_TRIS = 512                     # tri_consts: 512×16×4 B = 32 KB SMEM

_DEGEN_EPS = 1e-12


def _load_tri(tri_ref, t):
    """Read one triangle's 15 constants from SMEM as python-tuple scalars."""
    return tuple(tri_ref[t, k] for k in range(15))


def _tri_test(consts, ox, oy, oz, dx, dy, dz):
    """Unit-triangle-space hit candidate for one triangle vs a ray block.

    Returns (tt, uu, vv, dpz): the candidate distance, barycentrics and the
    local w-direction component (|dpz| < eps ⇒ parallel/degenerate → masked
    by the caller).
    """
    (w00, w01, w02, w10, w11, w12, w20, w21, w22,
     c0, c1, c2, _nx, _ny, _nz) = consts
    opx = ox * w00 + oy * w01 + oz * w02 + c0
    opy = ox * w10 + oy * w11 + oz * w12 + c1
    opz = ox * w20 + oy * w21 + oz * w22 + c2
    dpx = dx * w00 + dy * w01 + dz * w02
    dpy = dx * w10 + dy * w11 + dz * w12
    dpz = dx * w20 + dy * w21 + dz * w22
    inv = 1.0 / dpz
    tt = -opz * inv
    uu = opx + tt * dpx
    vv = opy + tt * dpy
    return tt, uu, vv, dpz


def _closest_kernel(tri_ref, mat_ref, ox_ref, oy_ref, oz_ref,
                    dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
                    t_out, id_out, mid_out, u_out, v_out,
                    nx_out, ny_out, nz_out):
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    tmin, tmax = tmin_ref[...], tmax_ref[...]
    num_tris = tri_ref.shape[0]

    zeros = jnp.zeros_like(ox)
    neg1 = jnp.full(ox.shape, -1, jnp.int32)
    init = (tmax, neg1, neg1, zeros, zeros, zeros, zeros, zeros)

    def body(t, carry):
        bt, bid, bmid, bu, bv, bnx, bny, bnz = carry
        consts = _load_tri(tri_ref, t)
        tt, uu, vv, dpz = _tri_test(consts, ox, oy, oz, dx, dy, dz)
        ok = ((jnp.abs(dpz) > _DEGEN_EPS)
              & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > tmin) & (tt < bt))      # running min ⇒ closest hit
        bt = jnp.where(ok, tt, bt)
        bid = jnp.where(ok, t, bid)
        bmid = jnp.where(ok, mat_ref[t, 0], bmid)
        bu = jnp.where(ok, uu, bu)
        bv = jnp.where(ok, vv, bv)
        bnx = jnp.where(ok, consts[12], bnx)
        bny = jnp.where(ok, consts[13], bny)
        bnz = jnp.where(ok, consts[14], bnz)
        return bt, bid, bmid, bu, bv, bnx, bny, bnz

    bt, bid, bmid, bu, bv, bnx, bny, bnz = jax.lax.fori_loop(
        0, num_tris, body, init)
    t_out[...] = bt
    id_out[...] = bid
    mid_out[...] = bmid
    u_out[...] = bu
    v_out[...] = bv
    nx_out[...] = bnx
    ny_out[...] = bny
    nz_out[...] = bnz


def _anyhit_kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tmin_ref, tmax_ref, occ_out):
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    tmin, tmax = tmin_ref[...], tmax_ref[...]
    num_tris = tri_ref.shape[0]

    # The carry is int32, not bool: Mosaic cannot thread an i1 vector through
    # scf.for (layout mismatch between the packed init and the loop body).
    def body(t, occ):
        consts = _load_tri(tri_ref, t)
        tt, uu, vv, dpz = _tri_test(consts, ox, oy, oz, dx, dy, dz)
        ok = ((jnp.abs(dpz) > _DEGEN_EPS)
              & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > tmin) & (tt < tmax))
        return jnp.maximum(occ, ok.astype(jnp.int32))

    occ = jax.lax.fori_loop(0, num_tris, body,
                            jnp.zeros(ox.shape, jnp.int32))
    occ_out[...] = occ


def _pad_reshape(a, n_padded, fill=0.0):
    pad = n_padded - a.shape[0]
    if pad:
        a = jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
    return a.reshape(n_padded // LANES, LANES)


def _ray_blocks(rays: Rays, n_padded):
    o, d = rays.origin, rays.direction
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             rays.tmin, rays.tmax]
    # Padding lanes get tmin=0, tmax=0 → the (tt>tmin)&(tt<tmax/bt) window is
    # empty, so they can never record a hit.
    return [_pad_reshape(c, n_padded) for c in comps]


def _block_specs(n):
    return [pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(n)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit(tri_consts, tri_mat, rays: Rays, interpret: bool = False):
    """Closest-hit query via the fused kernel.

    tri_consts: [M, 16] f32 (geometry.tri_consts); tri_mat: [M] i32.
    rays: flat [N]. Returns dict(t, prim_id, mat_id, u, v, normal) with
    miss ⇒ prim_id/mat_id = -1, t = tmax.
    """
    n = rays.tmin.shape[0]
    n_padded = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    grid = (n_padded // BLOCK_RAYS,)
    blocks = _ray_blocks(rays, n_padded)
    blk_shape = (n_padded // LANES, LANES)

    out_shapes = ([jax.ShapeDtypeStruct(blk_shape, jnp.float32)]
                  + [jax.ShapeDtypeStruct(blk_shape, jnp.int32)] * 2
                  + [jax.ShapeDtypeStruct(blk_shape, jnp.float32)] * 5)

    outs = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + _block_specs(8)),
        out_specs=tuple(_block_specs(8)),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(tri_consts, tri_mat.reshape(-1, 1).astype(jnp.int32), *blocks)

    t, pid, mid, u, v, nx, ny, nz = [o.reshape(n_padded)[:n] for o in outs]
    return dict(t=t, prim_id=pid, mat_id=mid,
                uv=jnp.stack([u, v], axis=-1),
                normal=jnp.stack([nx, ny, nz], axis=-1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit(tri_consts, rays: Rays, interpret: bool = False):
    """Occlusion query via the fused kernel → bool [N]."""
    n = rays.tmin.shape[0]
    n_padded = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    grid = (n_padded // BLOCK_RAYS,)
    blocks = _ray_blocks(rays, n_padded)
    blk_shape = (n_padded // LANES, LANES)

    occ = pl.pallas_call(
        _anyhit_kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] + _block_specs(8)),
        out_specs=pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(blk_shape, jnp.int32),
        interpret=interpret,
    )(tri_consts, *blocks)

    return occ.reshape(n_padded)[:n] != 0
