"""Micromaps: opacity classification + displaced micromeshes (build-time).

The reference builds two micromap flavors (`optixOpacityMicromapArrayBuild`,
`optixDisplacementMicromapArrayBuild`, `include/optix_host.h:731,807`):

- **Opacity micromaps** pre-classify sub-triangle regions of alpha-masked
  geometry as opaque / transparent / unknown so traversal can skip anyhit
  invocations (`optixOpacityMicromap` sample). Here: sample the cutout mask
  on a barycentric grid per triangle at a subdivision level and classify
  each micro-triangle; per-triangle summaries let the alpha-aware occlusion
  path short-circuit fully-opaque and fully-transparent triangles.
- **Displaced micromeshes** subdivide base triangles 4^level ways and push
  micro-vertices along interpolated directions by a displacement amount
  (`optixDisplacedMicromesh` sample). Here: a build-time tessellator that
  emits a plain (bigger) triangle mesh — on TPU more uniform triangles are
  exactly what the dense intersectors want.
"""
from __future__ import annotations

import numpy as np

# micro-triangle states (OptixOpacityMicromapState)
TRANSPARENT = 0
OPAQUE = 1
UNKNOWN_TRANSPARENT = 2
UNKNOWN_OPAQUE = 3


def _barycentric_grid(level: int):
    """Micro-triangle centroid barycentrics at subdivision `level`
    (4^level micro-triangles)."""
    n = 1 << level
    cents = []
    for row in range(n):
        for col in range(n - row):
            # upright micro-tri
            u = (col + 1.0 / 3.0) / n
            v = (row + 1.0 / 3.0) / n
            cents.append((u, v))
            # inverted micro-tri
            if col < n - row - 1:
                cents.append(((col + 2.0 / 3.0) / n, (row + 2.0 / 3.0) / n))
    return np.asarray(cents, np.float32)


def build_opacity_micromap(corner_uv, mask_fn, level: int = 3):
    """Classify each triangle's micro-triangles against a cutout mask.

    corner_uv: [M, 3, 2] per-corner texture coords; mask_fn(uv [K, 2]) →
    bool [K] (True = hole/transparent). Returns (micro_states [M, T] uint8,
    tri_summary [M] uint8) with summary OPAQUE / TRANSPARENT only when every
    micro-triangle agrees, else UNKNOWN_OPAQUE.
    """
    corner_uv = np.asarray(corner_uv, np.float32)
    cents = _barycentric_grid(level)                         # [T, 2]
    u = cents[:, 0]
    v = cents[:, 1]
    w = 1.0 - u - v
    # uv at each micro-centroid: [M, T, 2]
    uv = (w[None, :, None] * corner_uv[:, None, 0]
          + u[None, :, None] * corner_uv[:, None, 1]
          + v[None, :, None] * corner_uv[:, None, 2])
    m, t = uv.shape[:2]
    holes = np.asarray(mask_fn(uv.reshape(-1, 2))).reshape(m, t)
    states = np.where(holes, TRANSPARENT, OPAQUE).astype(np.uint8)
    summary = np.full(m, UNKNOWN_OPAQUE, np.uint8)
    summary[holes.all(axis=1)] = TRANSPARENT
    summary[~holes.any(axis=1)] = OPAQUE
    return states, summary


def checker_mask(scale: float):
    """The optixCutouts checkerboard mask as a mask_fn."""
    def fn(uv):
        fu = uv * scale
        return (np.floor(fu[:, 0]) + np.floor(fu[:, 1])) % 2.0 < 1.0
    return fn


def circle_mask(scale: float, radius: float = 0.25):
    def fn(uv):
        cell = uv * scale - np.floor(uv * scale) - 0.5
        return (cell ** 2).sum(axis=1) < radius * radius
    return fn


# ---------------------------------------------------------------------------
# Displaced micromesh tessellation
# ---------------------------------------------------------------------------

def displace_mesh(vertices, indices, displacement, directions=None,
                  level: int = 3):
    """Subdivide each triangle 4^level ways and displace micro-vertices.

    displacement: callable(points [K, 3], uv_bary [K, 3]) → [K] amounts, or
    a constant float. directions: [V, 3] per-vertex displacement directions
    (default: area-weighted vertex normals, like the DMM sample's direction
    vectors). Returns (new_vertices [K, 3], new_indices [F, 3]) — micro
    vertices are NOT shared across base triangles (simple and vectorized;
    watertightness across bases comes from identical corner/edge
    evaluation).
    """
    vertices = np.asarray(vertices, np.float32)
    indices = np.asarray(indices, np.int32)
    n = 1 << level

    if directions is None:
        directions = np.zeros_like(vertices)
        tri = vertices[indices]
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        for k in range(3):
            np.add.at(directions, indices[:, k], fn)
        norms = np.linalg.norm(directions, axis=1, keepdims=True)
        directions = directions / np.maximum(norms, 1e-20)

    # barycentric lattice (shared per base triangle)
    bary = []
    for row in range(n + 1):
        for col in range(n + 1 - row):
            bary.append((col / n, row / n))
    bary = np.asarray(bary, np.float32)              # [L, 2]
    u = bary[:, 0]
    v = bary[:, 1]
    w = 1.0 - u - v
    lattice = np.stack([w, u, v], axis=1)            # [L, 3]

    # lattice triangulation (same for every base tri)
    def row_start(row):
        return row * (n + 1) - row * (row - 1) // 2

    faces = []
    for row in range(n):
        for col in range(n - row):
            a = row_start(row) + col
            b = a + 1
            c = row_start(row + 1) + col
            faces.append((a, b, c))
            if col < n - row - 1:
                faces.append((b, row_start(row + 1) + col + 1, c))
    faces = np.asarray(faces, np.int32)              # [F0, 3]

    m = indices.shape[0]
    tri_v = vertices[indices]                        # [M, 3, 3]
    tri_d = directions[indices]                      # [M, 3, 3]
    pts = np.einsum("lk,mkx->mlx", lattice, tri_v)   # [M, L, 3]
    dirs = np.einsum("lk,mkx->mlx", lattice, tri_d)

    if callable(displacement):
        amounts = displacement(pts.reshape(-1, 3),
                               np.tile(lattice, (m, 1))).reshape(m, -1)
    else:
        amounts = np.full(pts.shape[:2], float(displacement), np.float32)
    new_pts = pts + dirs * amounts[..., None]

    L = lattice.shape[0]
    new_vertices = new_pts.reshape(-1, 3).astype(np.float32)
    offsets = (np.arange(m, dtype=np.int32) * L)[:, None, None]
    new_indices = (faces[None] + offsets).reshape(-1, 3).astype(np.int32)
    return new_vertices, new_indices
