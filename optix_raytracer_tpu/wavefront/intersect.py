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
from ..accel import traverse as trav
from ..accel.pallas_bf import MAX_SMEM_TRIS
from ..core.rays import Hits, Rays
from ..scene.device_scene import DeviceScene


def _use_bvh(scene: DeviceScene) -> bool:
    # Brute force wins while the whole mesh fits the fused kernel's SMEM
    # budget; beyond that the threaded LBVH takes over (when built).
    return scene.has_bvh and scene.geom.num_triangles > MAX_SMEM_TRIS


def scene_closest(scene: DeviceScene, rays: Rays,
                  chunk_size: Optional[int] = None) -> Hits:
    if _use_bvh(scene):
        hits = trav.traverse(scene.bvh, scene.geom, scene.tri_mat, rays)
    else:
        hits = bf.intersect_closest(scene.geom, rays, tri_mat=scene.tri_mat,
                                    chunk_size=chunk_size)
    if scene.prims.num:
        ph = prim_mod.intersect_prims_closest(scene.prims, rays)
        hits = prim_mod.merge_hits(hits, ph,
                                   prim_offset=scene.num_triangles)
    return hits


def scene_any(scene: DeviceScene, rays: Rays,
              chunk_size: Optional[int] = None):
    if _use_bvh(scene):
        occ = trav.traverse(scene.bvh, scene.geom, None, rays, any_hit=True)
    else:
        occ = bf.intersect_any(scene.geom, rays, chunk_size=chunk_size)
    if scene.prims.num:
        occ = occ | prim_mod.intersect_prims_any(scene.prims, rays)
    return occ
