"""DeviceScene: everything the wavefront engine needs, as one pytree.

The TPU-native analogue of the reference's launch-params + SBT package: the
`whitted::LaunchParams` device pointers (`SDK/cuda/whitted.h:89-107`) plus the
per-hitgroup geometry/material views the SBT records carry
(`SDK/sutil/Scene.cpp` createSBT). Because it is a pytree, the whole scene
donates/shards/jits as a unit; "updating the SBT" (dynamic materials,
`SDK/optixDynamicMaterials/`) is a functional record update.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..accel.clusters import (ClusterSet, LANES as _CLUSTER_LANES,
                              MAX_CLUSTERS, build_clusters)
from ..accel.geometry import TriangleGeometry, build_triangle_geometry
from ..accel.lbvh import LBVH, build_lbvh
from ..accel.pallas_bf import MAX_SMEM_TRIS
from ..accel.primitives import CustomPrims
from ..accel.tlas import InstanceTable
from ..shade.lights import LightTable, ParallelogramLight
from ..shade.materials import MaterialTable, make_material_table


@struct.dataclass
class DeviceScene:
    geom: TriangleGeometry
    tri_mat: jnp.ndarray                 # [M] int32 material id per triangle
    prims: CustomPrims                   # analytic custom primitives
    materials: MaterialTable
    lights: LightTable                   # point/ambient/directional/volumetric
    area_light: ParallelogramLight       # NEE target (emission=0 disables)
    miss_color: jnp.ndarray              # [3] constant background
    textures: jnp.ndarray                # [T, TH, TW, 4] f32 padded stack
    tex_size: jnp.ndarray                # [T, 2] i32 true (h, w) per texture
    bvh: LBVH                            # threaded LBVH (empty → brute force)
    # Triangle clusters for the Pallas large-mesh traversal (accel/clusters
    # .py); built for meshes past the fused kernel's SMEM budget.
    clusters: ClusterSet = struct.field(default_factory=ClusterSet.empty)
    # Two-level structure: when non-empty, `geom` is the OBJECT-space
    # concatenation of the instanced meshes and traversal goes through the
    # IAS path (accel/tlas.py) — per-frame instance matrix updates are
    # functional replaces, no geometry rebuild (`Scene.cpp:1134-1213`).
    instances: InstanceTable = struct.field(
        default_factory=InstanceTable.empty)
    # Static feature flags (not traced): e.g. "cutouts" enables alpha-mask
    # pass-through in the integrators. Determined at scene-build time.
    features: tuple = struct.field(pytree_node=False, default=())

    @property
    def num_triangles(self):
        return self.geom.num_triangles

    @property
    def has_cutouts(self):
        return "cutouts" in self.features

    @property
    def has_pbr(self):
        return "pbr" in self.features

    @property
    def has_bvh(self):
        return self.bvh.num_nodes > 0

    @property
    def has_clusters(self):
        return self.clusters.num_clusters > 0

    @property
    def has_instances(self):
        return self.instances.num > 0

    @property
    def has_textures(self):
        return self.textures.shape[0] > 0


def pack_textures(images):
    """List of [H, W, 3/4] uint8/float images → padded stack + size table.

    The `cudaMallocArray`/texture-object table of `Scene.cpp:604` becomes one
    dense [T, maxH, maxW, 4] f32 array (bilinear-gather-friendly) plus true
    sizes. Returns (textures, tex_size).
    """
    import numpy as np
    if not images:
        return (jnp.zeros((0, 1, 1, 4), jnp.float32),
                jnp.zeros((0, 2), jnp.int32))
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    out = np.zeros((len(images), max_h, max_w, 4), np.float32)
    sizes = np.zeros((len(images), 2), np.int32)
    for i, im in enumerate(images):
        im = np.asarray(im)
        if im.dtype == np.uint8:
            im = im.astype(np.float32) / 255.0
        if im.ndim == 2:
            im = im[..., None].repeat(3, axis=-1)
        if im.shape[-1] == 3:
            im = np.concatenate([im, np.ones_like(im[..., :1])], axis=-1)
        out[i, :im.shape[0], :im.shape[1]] = im
        sizes[i] = (im.shape[0], im.shape[1])
    return jnp.asarray(out), jnp.asarray(sizes)


def make_device_scene(vertices, indices, tri_mat, materials,
                      area_light: Optional[ParallelogramLight] = None,
                      lights=(), prims: Optional[CustomPrims] = None,
                      miss_color=(0.0, 0.0, 0.0), normals=None, uvs=None,
                      textures=(), with_bvh: bool = False,
                      instances: Optional[InstanceTable] = None
                      ) -> DeviceScene:
    if area_light is None:
        area_light = ParallelogramLight.make(
            (0, 0, 0), (1, 0, 0), (0, 0, 1), (0.0, 0.0, 0.0))
    tex, tex_size = pack_textures(list(textures))
    geom = build_triangle_geometry(vertices, indices, normals=normals,
                                   uvs=uvs)
    tri_mat_arr = jnp.asarray(tri_mat, jnp.int32)
    bvh = None
    if with_bvh:
        # Prefer the native host-side SAH builder (better trees for static
        # scenes); fall back to the on-device LBVH.
        from ..accel import native
        bvh = native.build_bvh_sah(geom)
        if bvh is None:
            bvh = build_lbvh(geom)
    # Cluster table for the Pallas large-mesh traversal: any mesh past the
    # fused kernel's SMEM budget, up to the VMEM-resident cluster cap.
    # (Instanced scenes traverse through the IAS path instead.)
    clusters = None
    n_tris = geom.num_triangles
    if (instances is None and n_tris > MAX_SMEM_TRIS
            and -(-n_tris // _CLUSTER_LANES) <= MAX_CLUSTERS):
        clusters = build_clusters(geom, tri_mat_arr)
    features = []
    if isinstance(materials, (list, tuple)):
        if any(m.get("cutout", 0) or m.get("alpha_mode", 0) == 1
               for m in materials):
            features.append("cutouts")
        from ..shade.materials import GLASS, PBR
        if any(m.get("kind", 0) == GLASS for m in materials):
            features.append("glass")
        def _is_mirror(m):
            return (m.get("kind", 0) == PBR and m.get("metallic", 0.0) > 0.99
                    and m.get("roughness", 0.5) <= 0.05)
        if any(_is_mirror(m) for m in materials):
            features.append("mirror")
        if any(m.get("kind", 0) == PBR and not _is_mirror(m)
               for m in materials):
            features.append("pbr")   # rough metallic-roughness GGX lanes
    else:
        # pre-built MaterialTable: assume every material family is possible
        features += ["glass", "mirror", "pbr"]
    return DeviceScene(
        features=tuple(features),
        geom=geom,
        bvh=bvh if bvh is not None else LBVH.empty(),
        clusters=clusters if clusters is not None else ClusterSet.empty(),
        instances=(instances if instances is not None
                   else InstanceTable.empty()),
        tri_mat=tri_mat_arr,
        prims=prims if prims is not None else CustomPrims.empty(),
        materials=(materials if isinstance(materials, MaterialTable)
                   else make_material_table(materials)),
        lights=LightTable.make(list(lights)),
        area_light=area_light,
        miss_color=jnp.asarray(miss_color, jnp.float32),
        textures=tex,
        tex_size=tex_size,
    )
