"""Two-level acceleration: instances (IAS) over triangle GAS handles.

The reference's instance path: an `OptixInstance` array (row-major 3x4
transform + instanceId + sbtOffset, `include/optix_types.h:970-1010`) built
into an IAS (`Scene.cpp:1134-1213` buildInstanceAccel), traversed with the
device transform stack (`optix_device.h:728-868`).

TPU-native form: an instance table of affine transforms; traversal loops the
(static, usually small) instance list, transforms the wavefront into each
instance's object space, intersects the shared GAS once, and keeps the
per-ray minimum — the "transform stack" is a pair of affine maps applied to
whole arrays. Hits report inst_id and sbt-offset material ids
(`sbtOffset + geometryIndex*rayTypeCount + rayType` collapses to
`sbt_offset + tri_mat[prim]`, the indexing rule at `Scene.cpp:1154`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import struct

from ..core import transforms as xf
from ..core.rays import Hits, Rays
from . import bruteforce as bf
from .geometry import TriangleGeometry


@struct.dataclass
class InstanceTable:
    """SoA instance array over ONE shared GAS (the common reference pattern:
    optixMotionGeometry/meshes instancing a geometry per node)."""
    transform: jnp.ndarray      # [I, 3, 4] object→world
    inv_transform: jnp.ndarray  # [I, 3, 4] world→object
    sbt_offset: jnp.ndarray     # [I] int32
    instance_id: jnp.ndarray    # [I] int32 (user-visible id)

    @property
    def num(self):
        return self.transform.shape[0]


def make_instances(transforms: Sequence, sbt_offsets=None,
                   instance_ids=None) -> InstanceTable:
    import numpy as np
    transforms = jnp.asarray(np.stack([np.asarray(t, np.float32)[:3, :4]
                                       for t in transforms]))
    n = transforms.shape[0]
    inv = xf.inverse(transforms)
    return InstanceTable(
        transform=transforms,
        inv_transform=inv,
        sbt_offset=jnp.asarray(sbt_offsets if sbt_offsets is not None
                               else jnp.zeros(n, jnp.int32), jnp.int32),
        instance_id=jnp.asarray(instance_ids if instance_ids is not None
                                else jnp.arange(n), jnp.int32),
    )


def intersect_instances(geom: TriangleGeometry, instances: InstanceTable,
                        rays: Rays, tri_mat=None,
                        chunk_size: Optional[int] = None) -> Hits:
    """Closest hit through the two-level structure (flat rays [N]).

    The instance loop is a static python loop — instance counts in the
    reference scenes are small (each iteration is one fused GAS query over
    the whole wavefront). Reported t stays in world units because object-
    space direction keeps its (possibly non-unit) scaled length.
    """
    n = rays.tmin.shape[0]
    best = Hits.none((n,), tmax=1e16)
    best = best.replace(t=rays.tmax)

    for i in range(instances.num):
        inv = instances.inv_transform[i]
        o = xf.apply_point(jnp.broadcast_to(inv, (n, 3, 4)), rays.origin)
        d = xf.apply_vector(jnp.broadcast_to(inv, (n, 3, 4)), rays.direction)
        obj_rays = Rays(origin=o, direction=d, tmin=rays.tmin,
                        tmax=best.t)          # current-best culls later work
        h = bf.intersect_closest(geom, obj_rays, tri_mat=tri_mat,
                                 chunk_size=chunk_size)
        closer = h.valid & (h.t < best.t)
        # transform the normal back to world (inverse-transpose of object→world
        # linear part = transpose of inv's linear part applied as apply_normal)
        fwd = instances.transform[i]
        n_world = xf.apply_normal(jnp.broadcast_to(fwd, (n, 3, 4)), h.normal)
        n_world = n_world / jnp.maximum(
            jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-12)
        best = Hits(
            t=jnp.where(closer, h.t, best.t),
            prim_id=jnp.where(closer, h.prim_id, best.prim_id),
            inst_id=jnp.where(closer, instances.instance_id[i],
                              best.inst_id),
            mat_id=jnp.where(closer, h.mat_id + instances.sbt_offset[i],
                             best.mat_id),
            uv=jnp.where(closer[:, None], h.uv, best.uv),
            normal=jnp.where(closer[:, None], n_world, best.normal),
        )
    # misses keep mat/prim = -1
    miss = best.prim_id < 0
    return best.replace(mat_id=jnp.where(miss, -1, best.mat_id),
                        t=jnp.where(miss, rays.tmax, best.t))
