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

from ..accel.geometry import TriangleGeometry, build_triangle_geometry
from ..accel.primitives import CustomPrims
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

    @property
    def num_triangles(self):
        return self.geom.num_triangles


def make_device_scene(vertices, indices, tri_mat, materials,
                      area_light: Optional[ParallelogramLight] = None,
                      lights=(), prims: Optional[CustomPrims] = None,
                      miss_color=(0.0, 0.0, 0.0)) -> DeviceScene:
    if area_light is None:
        area_light = ParallelogramLight.make(
            (0, 0, 0), (1, 0, 0), (0, 0, 1), (0.0, 0.0, 0.0))
    return DeviceScene(
        geom=build_triangle_geometry(vertices, indices),
        tri_mat=jnp.asarray(tri_mat, jnp.int32),
        prims=prims if prims is not None else CustomPrims.empty(),
        materials=(materials if isinstance(materials, MaterialTable)
                   else make_material_table(materials)),
        lights=LightTable.make(list(lights)),
        area_light=area_light,
        miss_color=jnp.asarray(miss_color, jnp.float32),
    )
