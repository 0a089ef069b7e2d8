"""Distributed scene memory: sharded texture storage over the mesh.

The optixNVLink pattern (`SDK/optixNVLink/optixNVLink.cpp:1524-1569,
1698-1712`): discover P2P islands and store one texture copy per island,
spread across its members, with peers sampling over NVLink. On TPU the mesh
*is* the island (ICI all-to-all), so the equivalent is storing the texture
stack sharded across chips with `jax.sharding` and letting XLA insert the
ICI gathers where sampling needs remote texels — no topology-discovery code,
no explicit peer enables.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tiles import ROWS_AXIS


def shard_scene_textures(scene, mesh: Mesh, axis: str = ROWS_AXIS):
    """Place the texture stack sharded over `axis` (rows of every texture
    spread across chips). Per-chip HBM cost drops by the axis size; sampling
    under jit inserts the gather collectives automatically."""
    if scene.textures.shape[0] == 0:
        return scene
    sharding = NamedSharding(mesh, P(None, axis, None, None))
    return scene.replace(textures=jax.device_put(scene.textures, sharding))


def replicate_scene(scene, mesh: Mesh):
    """Explicitly replicate the whole scene pytree on every chip (the
    optixMultiGPU model: scene copy per device)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), scene)
