"""Brute-force all-rays × all-triangles intersection via MXU matmuls.

For meshes up to a few thousand triangles (the whole OptiX sample suite's
geometry: Cornell = 32 tris, Whitted custom prims, one-triangle samples), testing
every ray against every triangle as two `[N,3] @ [3,3M]` matmuls plus an
elementwise/reduce epilogue is *faster* on TPU than any divergent traversal —
the work rides the systolic array at full utilization and there is no
incoherent gather. This module is the "traversal core" the driver hides behind
`optixTrace` (`include/optix_device.h:61`) for small scenes; `accel/lbvh.py` +
`accel/traverse.py` take over for large ones.

Intersection math: see `accel/geometry.py` (unit-triangle transform).
Matmuls run at `Precision.HIGHEST` — geometry needs full f32, and the MXU has
orders of magnitude more throughput than this workload needs, so the 6-pass
f32 emulation is free in practice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.rays import Hits, Rays
from .geometry import TriangleGeometry

_PREC = jax.lax.Precision.HIGHEST
_DEGEN_EPS = 1e-12


def _transform_rays(geom: TriangleGeometry, origin, direction):
    """Map rays into every triangle's unit frame. Returns ([N, M, 3] o', d')."""
    n = origin.shape[0]
    m = geom.num_triangles
    o_p = (jnp.dot(origin, geom.w_mat, precision=_PREC) + geom.w_off).reshape(n, m, 3)
    d_p = jnp.dot(direction, geom.w_mat, precision=_PREC).reshape(n, m, 3)
    return o_p, d_p


def _hit_matrix(geom: TriangleGeometry, rays: Rays):
    """Per-(ray, triangle) hit candidates: (t, u, v, hit_mask), each [N, M]."""
    o_p, d_p = _transform_rays(geom, rays.origin, rays.direction)
    dz = d_p[..., 2]
    safe_dz = jnp.where(jnp.abs(dz) < _DEGEN_EPS, _DEGEN_EPS, dz)
    t = -o_p[..., 2] / safe_dz
    u = o_p[..., 0] + t * d_p[..., 0]
    v = o_p[..., 1] + t * d_p[..., 1]
    hit = ((jnp.abs(dz) >= _DEGEN_EPS)
           & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > rays.tmin[:, None]) & (t < rays.tmax[:, None])
           & geom.valid[None, :])
    return t, u, v, hit


def _closest_chunk(geom: TriangleGeometry, rays: Rays) -> Hits:
    t, u, v, hit = _hit_matrix(geom, rays)
    t_masked = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t_masked, axis=1)                     # [N]
    best_t = jnp.take_along_axis(t_masked, best[:, None], axis=1)[:, 0]
    any_hit = jnp.isfinite(best_t)
    bu = jnp.take_along_axis(u, best[:, None], axis=1)[:, 0]
    bv = jnp.take_along_axis(v, best[:, None], axis=1)[:, 0]
    return Hits(
        t=jnp.where(any_hit, best_t, rays.tmax),
        prim_id=jnp.where(any_hit, best.astype(jnp.int32), -1),
        inst_id=jnp.where(any_hit, 0, -1),
        uv=jnp.stack([bu, bv], axis=-1),
    )


def _occluded_chunk(geom: TriangleGeometry, rays: Rays) -> jnp.ndarray:
    _, _, _, hit = _hit_matrix(geom, rays)
    return jnp.any(hit, axis=1)


def _chunked(fn, rays: Rays, chunk_size):
    """Run `fn` over the flattened ray batch in fixed-size chunks via lax.map,
    bounding the [chunk, M] intermediates to VMEM-friendly sizes regardless of
    wavefront length. Pads the tail chunk (masked rays hit nothing: tmax=tmin)."""
    batch_shape = rays.batch_shape
    n = 1
    for s in batch_shape:
        n *= s
    flat = jax.tree.map(lambda a: a.reshape((n,) + a.shape[len(batch_shape):]), rays)
    if chunk_size is None or n <= chunk_size:
        out = fn(flat)
    else:
        pad = (-n) % chunk_size
        padded = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0), flat)
        chunks = jax.tree.map(
            lambda a: a.reshape((-1, chunk_size) + a.shape[1:]), padded)
        out = jax.lax.map(fn, chunks)
        out = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:])[:n], out)
    return jax.tree.map(lambda a: a.reshape(batch_shape + a.shape[1:]), out)


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def intersect_closest(geom: TriangleGeometry, rays: Rays, chunk_size=65536) -> Hits:
    """Closest-hit query over a ray batch of any shape → `Hits` (same batch).

    The `optixTrace` radiance-ray analogue (`SDK/cuda/whitted_cuda.h:90-126`
    traceRadiance) for a single-GAS scene.
    """
    return _chunked(lambda r: _closest_chunk(geom, r), rays, chunk_size)


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def intersect_any(geom: TriangleGeometry, rays: Rays, chunk_size=65536) -> jnp.ndarray:
    """Boolean occlusion query (shadow rays) — the `traceOcclusion` analogue
    (`SDK/cuda/whitted_cuda.h:128-160`, terminate-on-first-hit semantics)."""
    return _chunked(lambda r: _occluded_chunk(geom, r), rays, chunk_size)
