"""Axis-aligned bounding boxes as [..., 3] lo/hi array pairs.

Replaces `SDK/sutil/Aabb.h` (host AABB class) and the AABB build inputs the
reference feeds `optixAccelBuild` for custom primitives
(`include/optix_types.h:925`, `SDK/optixWhitted/optixWhitted.cpp:381-430`).
Functional style: an AABB is just a `(lo, hi)` tuple of arrays, so boxes
batch/vmap/shard like any other data.
"""
from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


def empty(batch_shape=()):
    return (jnp.full(batch_shape + (3,), jnp.inf, jnp.float32),
            jnp.full(batch_shape + (3,), -jnp.inf, jnp.float32))


def from_points(pts, axis=-2):
    """AABB over a set of points; reduces `axis` (default: second-to-last)."""
    return jnp.min(pts, axis=axis), jnp.max(pts, axis=axis)


def union(a, b):
    return jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])


def center(box):
    return 0.5 * (box[0] + box[1])


def extent(box):
    return box[1] - box[0]


def surface_area(box):
    d = jnp.maximum(box[1] - box[0], 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def intersect_ray(lo, hi, origin, inv_dir, tmin, tmax):
    """Slab test. Returns (hit_mask, t_enter). Batched over leading axes.

    inv_dir is precomputed 1/direction (IEEE inf on zero components is fine:
    the min/max slab formulation below is robust to it).
    """
    t0 = (lo - origin) * inv_dir
    t1 = (hi - origin) * inv_dir
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(t_near, tmin)
    hit = (t_enter <= jnp.minimum(t_far, tmax)) & (t_far >= tmin)
    return hit, t_enter
