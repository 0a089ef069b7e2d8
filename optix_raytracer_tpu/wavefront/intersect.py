"""Scene-level intersection: triangles + custom primitives, merged.

The dispatch role of the reference's two-level traversal + SBT: a scene's GAS
set (triangle meshes and custom-primitive AABB inputs,
`SDK/optixWhitted/optixWhitted.cpp:381-430`) resolves to one closest hit. Ids
stay disjoint: custom prim i reports prim_id = num_triangles + i.
"""
from __future__ import annotations

from typing import Optional

from ..accel import bruteforce as bf
from ..accel import primitives as prim_mod
from ..core.rays import Hits, Rays
from ..scene.device_scene import DeviceScene


def scene_closest(scene: DeviceScene, rays: Rays,
                  chunk_size: Optional[int] = None) -> Hits:
    hits = bf.intersect_closest(scene.geom, rays, tri_mat=scene.tri_mat,
                                chunk_size=chunk_size)
    if scene.prims.num:
        ph = prim_mod.intersect_prims_closest(scene.prims, rays)
        hits = prim_mod.merge_hits(hits, ph,
                                   prim_offset=scene.num_triangles)
    return hits


def scene_any(scene: DeviceScene, rays: Rays,
              chunk_size: Optional[int] = None):
    occ = bf.intersect_any(scene.geom, rays, chunk_size=chunk_size)
    if scene.prims.num:
        occ = occ | prim_mod.intersect_prims_any(scene.prims, rays)
    return occ
