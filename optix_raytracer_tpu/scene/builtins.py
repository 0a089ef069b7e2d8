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
