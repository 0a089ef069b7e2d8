"""Built-in scenes: the Cornell box (north-star benchmark scene) and friends.

The Cornell-box geometry uses the classic published measurement data from
Cornell's "box data" page (the same physical scene the reference's
optixPathTracer models: 32 triangles — walls, ceiling light, short and tall
blocks). Built here from the quad list, not copied from any code: each quad is
two CCW triangles with a material id.
"""
from __future__ import annotations

import numpy as np

from ..core.camera import Camera
from ..shade import materials as mat
from ..shade.lights import ParallelogramLight
from .device_scene import DeviceScene, make_device_scene

# Material ids for the Cornell box
WHITE, GREEN, RED, LIGHT = 0, 1, 2, 3

# The classic Cornell reflectance/emission setup (approximate flat-RGB version
# used by virtually every renderer's cornell sample).
CORNELL_MATERIALS = [
    {"kind": mat.DIFFUSE, "base_color": (0.80, 0.80, 0.80)},                     # white
    {"kind": mat.DIFFUSE, "base_color": (0.05, 0.80, 0.05)},                     # green
    {"kind": mat.DIFFUSE, "base_color": (0.80, 0.05, 0.05)},                     # red
    {"kind": mat.DIFFUSE, "base_color": (0.78, 0.78, 0.78),
     "emission": (15.0, 15.0, 15.0)},                                            # lamp
]

# Quads as (4 corner points, material). Classic Cornell measurement data.
_CORNELL_QUADS = [
    # floor
    ([(552.8, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 559.2), (549.6, 0.0, 559.2)], WHITE),
    # ceiling
    ([(556.0, 548.8, 0.0), (556.0, 548.8, 559.2), (0.0, 548.8, 559.2), (0.0, 548.8, 0.0)], WHITE),
    # back wall
    ([(549.6, 0.0, 559.2), (0.0, 0.0, 559.2), (0.0, 548.8, 559.2), (556.0, 548.8, 559.2)], WHITE),
    # right wall (green)
    ([(0.0, 0.0, 559.2), (0.0, 0.0, 0.0), (0.0, 548.8, 0.0), (0.0, 548.8, 559.2)], GREEN),
    # left wall (red)
    ([(552.8, 0.0, 0.0), (549.6, 0.0, 559.2), (556.0, 548.8, 559.2), (556.0, 548.8, 0.0)], RED),
    # short block
    ([(130.0, 165.0, 65.0), (82.0, 165.0, 225.0), (240.0, 165.0, 272.0), (290.0, 165.0, 114.0)], WHITE),
    ([(290.0, 0.0, 114.0), (290.0, 165.0, 114.0), (240.0, 165.0, 272.0), (240.0, 0.0, 272.0)], WHITE),
    ([(130.0, 0.0, 65.0), (130.0, 165.0, 65.0), (290.0, 165.0, 114.0), (290.0, 0.0, 114.0)], WHITE),
    ([(82.0, 0.0, 225.0), (82.0, 165.0, 225.0), (130.0, 165.0, 65.0), (130.0, 0.0, 65.0)], WHITE),
    ([(240.0, 0.0, 272.0), (240.0, 165.0, 272.0), (82.0, 165.0, 225.0), (82.0, 0.0, 225.0)], WHITE),
    # tall block
    ([(423.0, 330.0, 247.0), (265.0, 330.0, 296.0), (314.0, 330.0, 456.0), (472.0, 330.0, 406.0)], WHITE),
    ([(423.0, 0.0, 247.0), (423.0, 330.0, 247.0), (472.0, 330.0, 406.0), (472.0, 0.0, 406.0)], WHITE),
    ([(472.0, 0.0, 406.0), (472.0, 330.0, 406.0), (314.0, 330.0, 456.0), (314.0, 0.0, 456.0)], WHITE),
    ([(314.0, 0.0, 456.0), (314.0, 330.0, 456.0), (265.0, 330.0, 296.0), (265.0, 0.0, 296.0)], WHITE),
    ([(265.0, 0.0, 296.0), (265.0, 330.0, 296.0), (423.0, 330.0, 247.0), (423.0, 0.0, 247.0)], WHITE),
    # ceiling light (slightly below the ceiling)
    ([(343.0, 548.6, 227.0), (213.0, 548.6, 227.0), (213.0, 548.6, 332.0), (343.0, 548.6, 332.0)], LIGHT),
]

CORNELL_LIGHT_CORNER = (343.0, 548.6, 227.0)
CORNELL_LIGHT_V1 = (-130.0, 0.0, 0.0)
CORNELL_LIGHT_V2 = (0.0, 0.0, 105.0)
CORNELL_LIGHT_EMISSION = (15.0, 15.0, 15.0)


def quads_to_triangles(quads):
    """[(4 points, mat_id)] → (vertices [V,3], indices [2Q,3], tri_mat [2Q])."""
    verts, idx, tri_mat = [], [], []
    for corners, m in quads:
        base = len(verts)
        verts.extend(corners)
        idx.append((base + 0, base + 1, base + 2))
        idx.append((base + 0, base + 2, base + 3))
        tri_mat.extend([m, m])
    return (np.asarray(verts, np.float32), np.asarray(idx, np.int32),
            np.asarray(tri_mat, np.int32))


def cornell_box() -> DeviceScene:
    verts, idx, tri_mat = quads_to_triangles(_CORNELL_QUADS)
    light = ParallelogramLight.make(
        CORNELL_LIGHT_CORNER, CORNELL_LIGHT_V1, CORNELL_LIGHT_V2,
        CORNELL_LIGHT_EMISSION)
    return make_device_scene(verts, idx, tri_mat, CORNELL_MATERIALS,
                             area_light=light, miss_color=(0.0, 0.0, 0.0))


def cornell_box_instanced() -> DeviceScene:
    """Cornell box as an IAS scene: walls+light are one instance, the two
    blocks are transformed instances of ONE shared unit-box mesh — the
    `Scene.cpp:1134-1213` two-level layout on the classic scene. Block
    transforms are the affine frames of the measured block tops (the real
    blocks are ~2 units off parallelepiped, so the image differs from
    cornell_box() by a sliver at block edges)."""
    import numpy as np

    from .scene import Scene

    sc = Scene()
    for m in CORNELL_MATERIALS:
        sc.add_material(dict(m))

    room_quads = _CORNELL_QUADS[:5] + [_CORNELL_QUADS[15]]
    verts, idx, tri_mat = quads_to_triangles(room_quads)
    room = sc.add_mesh(np.asarray(verts), np.asarray(idx),
                       material=np.asarray(tri_mat))

    # unit box (no bottom face), instanced twice
    bq = [
        ([(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)], 0),   # top
        ([(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)], 0),
        ([(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)], 0),
        ([(0, 0, 1), (0, 1, 1), (0, 1, 0), (0, 0, 0)], 0),
        ([(1, 0, 1), (1, 1, 1), (0, 1, 1), (0, 0, 1)], 0),
    ]
    bverts, bidx, _ = quads_to_triangles(bq)
    box = sc.add_mesh(np.asarray(bverts), np.asarray(bidx), material=WHITE)

    def frame(origin, x, y, z):
        t = np.eye(4, dtype=np.float32)
        t[:3, 0], t[:3, 1], t[:3, 2], t[:3, 3] = x, y, z, origin
        return t

    sc.add_instance(room, np.eye(4, dtype=np.float32))
    sc.add_instance(box, frame((130, 0, 65), (160, 0, 49),
                               (0, 165, 0), (-48, 0, 160)))     # short block
    sc.add_instance(box, frame((423, 0, 247), (49, 0, 159),
                               (0, 330, 0), (-158, 0, 49)))     # tall block
    light = ParallelogramLight.make(
        CORNELL_LIGHT_CORNER, CORNELL_LIGHT_V1, CORNELL_LIGHT_V2,
        CORNELL_LIGHT_EMISSION)
    ds = sc.finalize(area_light=light)
    import jax.numpy as jnp
    return ds.replace(miss_color=jnp.zeros((3,), jnp.float32))


def cornell_camera(width, height) -> Camera:
    """The classic Cornell viewpoint (matches the reference's default camera
    geometry: eye in front of the open face, 35° vertical fov —
    `optixPathTracer.cpp` initCameraState)."""
    return Camera(eye=(278.0, 273.0, -900.0), lookat=(278.0, 273.0, 330.0),
                  up=(0.0, 1.0, 0.0), fov_y=35.0, aspect=width / height)


def whitted_scene() -> DeviceScene:
    """The Whitted classic: glass sphere-shell + phong sphere over a checkered
    floor, one point light + ambient (the optixWhitted scene shape:
    `SDK/optixWhitted/optixWhitted.cpp:381-430` geometry, `SDK/cuda/shading.cu`
    materials)."""
    from ..accel import primitives as prim
    from ..shade.lights import AMBIENT, POINT

    materials = [
        # 0: checkered phong floor
        {"kind": mat.CHECKER, "base_color": (0.8, 0.3, 0.15),
         "checker1": (0.9, 0.85, 0.05), "checker_scale": 16.0,
         "specular": (0.2, 0.2, 0.2), "phong_exp": 32.0,
         "kr": (0.1, 0.1, 0.1)},
        # 1: glass sphere shell
        {"kind": mat.GLASS, "ior": 1.4, "kr": (0.9, 0.9, 0.9)},
        # 2: blue phong sphere with mirror-ish highlight
        {"kind": mat.PHONG, "base_color": (0.1, 0.2, 0.7),
         "specular": (0.5, 0.5, 0.5), "phong_exp": 64.0,
         "kr": (0.25, 0.25, 0.25)},
    ]
    prims = prim.make_prims([
        {"kind": prim.PARALLELOGRAM, "mat_id": 0,
         "anchor": (-16.0, 0.01, -8.0), "v1": (32.0, 0.0, 0.0),
         "v2": (0.0, 0.0, 16.0)},
        {"kind": prim.SPHERE_SHELL, "mat_id": 1, "center": (2.0, 1.5, -2.5),
         "radius_inner": 0.96, "radius_outer": 1.0},
        {"kind": prim.SPHERE, "mat_id": 2, "center": (4.5, 1.0, -4.0),
         "radius": 1.0},
    ])
    lights = [
        {"kind": POINT, "position": (60.0, 40.0, 0.0),
         "color": (1.0, 1.0, 1.0), "falloff": 0},
        {"kind": AMBIENT, "color": (0.35, 0.35, 0.35)},
    ]
    empty_tri = np.zeros((3, 3), np.float32)
    empty_idx = np.zeros((1, 3), np.int32)  # one degenerate triangle
    return make_device_scene(empty_tri, empty_idx, np.zeros(1, np.int32),
                             materials, prims=prims, lights=lights,
                             miss_color=(0.34, 0.55, 0.85))


def whitted_camera(width, height) -> Camera:
    return Camera(eye=(8.0, 2.0, 1.0), lookat=(3.0, 1.1, -3.0),
                  up=(0.0, 1.0, 0.0), fov_y=45.0, aspect=width / height)


def trefoil_mesh(segments: int = 140, sides: int = 45, tube_radius=0.35,
                 scale=1.0):
    """Procedural trefoil-knot tube: 2*segments*sides triangles with smooth
    per-vertex normals. The stand-in for the reference meshViewer's GLTF
    assets (`SDK/optixMeshViewer`) — a large, self-occluding mesh for
    exercising and benchmarking the large-mesh traversal path.

    Returns (vertices [V,3] f32, indices [M,3] i32, normals [V,3] f32).
    """
    t = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    # Trefoil curve + analytic tangent.
    p = np.stack([np.sin(t) + 2.0 * np.sin(2.0 * t),
                  np.cos(t) - 2.0 * np.cos(2.0 * t),
                  -np.sin(3.0 * t)], axis=1)
    dp = np.stack([np.cos(t) + 4.0 * np.cos(2.0 * t),
                   -np.sin(t) + 4.0 * np.sin(2.0 * t),
                   -3.0 * np.cos(3.0 * t)], axis=1)
    tan = dp / np.linalg.norm(dp, axis=1, keepdims=True)
    # Stable frame: project a fixed up-ish vector out of the tangent.
    ref = np.tile(np.array([0.37, 0.61, 0.71]), (segments, 1))
    n = ref - np.sum(ref * tan, axis=1, keepdims=True) * tan
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    b = np.cross(tan, n)

    phi = np.linspace(0.0, 2.0 * np.pi, sides, endpoint=False)
    ring = (np.cos(phi)[None, :, None] * n[:, None, :]
            + np.sin(phi)[None, :, None] * b[:, None, :])   # [S, sides, 3]
    verts = (p[:, None, :] + tube_radius * ring) * scale
    normals = ring.reshape(-1, 3).astype(np.float32)
    verts = verts.reshape(-1, 3).astype(np.float32)

    ii, jj = np.meshgrid(np.arange(segments), np.arange(sides),
                         indexing="ij")
    i2 = (ii + 1) % segments
    j2 = (jj + 1) % sides
    a = ii * sides + jj
    b_ = ii * sides + j2
    c = i2 * sides + jj
    d = i2 * sides + j2
    tri1 = np.stack([a, b_, d], axis=-1).reshape(-1, 3)
    tri2 = np.stack([a, d, c], axis=-1).reshape(-1, 3)
    idx = np.stack([tri1, tri2], axis=1).reshape(-1, 3)
    return verts, np.asarray(idx, np.int32), normals


def knot_scene(segments: int = 140, sides: int = 45) -> DeviceScene:
    """Large-mesh benchmark scene: a trefoil-knot tube (~2*segments*sides
    triangles) over a floor quad, lit by an overhead area light. The
    large-mesh analogue of the Cornell north-star scene."""
    verts, idx, normals = trefoil_mesh(segments, sides)
    # Floor quad under the knot
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    ext = float(np.max(hi - lo))
    fy = lo[1] - 0.1 * ext
    f0 = len(verts)
    floor = np.array([
        [lo[0] - ext, fy, lo[2] - ext], [hi[0] + ext, fy, lo[2] - ext],
        [hi[0] + ext, fy, hi[2] + ext], [lo[0] - ext, fy, hi[2] + ext]],
        np.float32)
    verts = np.concatenate([verts, floor])
    normals = np.concatenate(
        [normals, np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))])
    idx = np.concatenate([idx, np.array(
        [[f0, f0 + 2, f0 + 1], [f0, f0 + 3, f0 + 2]], np.int32)])
    tri_mat = np.concatenate([
        np.zeros(len(idx) - 2, np.int32), np.ones(2, np.int32)])

    ly = hi[1] + 1.2 * ext
    light = ParallelogramLight.make(
        (lo[0], ly, lo[2]), (hi[0] - lo[0], 0.0, 0.0),
        (0.0, 0.0, hi[2] - lo[2]), (10.0, 10.0, 10.0))
    materials = [
        {"kind": mat.DIFFUSE, "base_color": (0.75, 0.55, 0.25)},  # knot
        {"kind": mat.DIFFUSE, "base_color": (0.65, 0.65, 0.70)},  # floor
    ]
    return make_device_scene(verts, idx, tri_mat, materials,
                             area_light=light, normals=normals,
                             miss_color=(0.0, 0.0, 0.0))


def knot_camera(width, height) -> Camera:
    return Camera(eye=(0.0, 2.5, -9.0), lookat=(0.0, 0.0, 0.0),
                  up=(0.0, 1.0, 0.0), fov_y=45.0, aspect=width / height)
