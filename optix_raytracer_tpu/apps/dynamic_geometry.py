"""optixDynamicGeometry equivalent: animated vertices + per-frame refit.

Reference: `SDK/optixDynamicGeometry/` — a vertex-generation CUDA kernel
deforms a mesh each frame, the GAS is refit (`OPTIX_BUILD_OPERATION_UPDATE`,
`optixDynamicGeometry.cpp:412-435`) and periodically rebuilt for quality
(`:439-460`). Here the deformation is a jitted function and "refit" is
rebuilding the derived triangle tables on device — the rebuild-vs-refit
distinction disappears because the full build is itself a fast data-parallel
program.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..api.accel import build_gas, refit_gas
from ..core import film as film_mod
from ..core.camera import Camera
from ..io.image import save_image
from ..scene.device_scene import make_device_scene
from ..shade import materials as mat
from ..shade.lights import ParallelogramLight
from ..wavefront.engine import render_accumulate


def make_grid_mesh(n: int = 24, size: float = 2.0):
    """A flat (n+1)² vertex grid, deformed per frame into waves
    (the sample's `generate_vertices` kernel role)."""
    xs = np.linspace(-size / 2, size / 2, n + 1, dtype=np.float32)
    zs = np.linspace(-size / 2, size / 2, n + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)
    verts = np.stack([gx, np.zeros_like(gx), gz], axis=-1).reshape(-1, 3)
    idx = []
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i
            idx += [(a, a + 1, a + n + 1), (a + 1, a + n + 2, a + n + 1)]
    return verts, np.asarray(idx, np.int32)


@jax.jit
def animate_vertices(base_verts, time):
    """The per-frame vertex generator: travelling sine waves."""
    x = base_verts[:, 0]
    z = base_verts[:, 2]
    y = 0.25 * jnp.sin(4.0 * x + 3.0 * time) * jnp.cos(4.0 * z + 2.0 * time)
    return base_verts.at[:, 1].set(y)


def render_frame(handle, time_val, base_verts, width, height, samples=4):
    verts_t = animate_vertices(jnp.asarray(base_verts), time_val)
    handle = refit_gas(handle, verts_t)     # the per-frame GAS update
    light = ParallelogramLight.make((-0.5, 2.0, -0.5), (1.0, 0, 0),
                                    (0, 0, 1.0), (8.0, 8.0, 8.0))
    scene = make_device_scene(
        verts_t, handle.geom.indices,
        np.zeros(handle.geom.num_triangles, np.int32),
        [{"kind": mat.DIFFUSE, "base_color": (0.4, 0.6, 0.9)}],
        area_light=light)
    cam = Camera(eye=(0, 2.2, 3.2), lookat=(0, 0, 0), fov_y=35,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    film, _ = render_accumulate(scene, cam, film, width, height,
                                samples_per_launch=samples, max_depth=2,
                                chunk_size=None)
    return film.accum, handle


def render_frames_ias(width, height, frames, samples=4):
    """The sample's OTHER dynamic mode: the geometry never changes — only
    the per-instance IAS matrices do (`optixDynamicGeometry.cpp` IAS
    update). The DeviceScene is built ONCE; each frame functionally
    replaces the instance table (no GAS rebuild, no refit)."""
    from ..accel.tlas import make_instances
    from ..scene.scene import Scene

    s = Scene()
    s.add_material({"kind": mat.DIFFUSE, "base_color": (0.4, 0.6, 0.9)})
    s.add_material({"kind": mat.DIFFUSE, "base_color": (0.9, 0.5, 0.3)})
    verts, idx = make_grid_mesh(n=8, size=1.0)
    mi = s.add_mesh(verts, idx, material=0)
    s.add_instance(mi)
    s.add_instance(mi, sbt_offset=1)
    light = ParallelogramLight.make((-0.5, 2.0, -0.5), (1.0, 0, 0),
                                    (0, 0, 1.0), (8.0, 8.0, 8.0))
    scene = s.finalize(area_light=light)
    cam = Camera(eye=(0, 2.2, 3.2), lookat=(0, 0, 0), fov_y=35,
                 aspect=width / height).params()

    def xform(dx, dy, angle):
        c, sn = np.cos(angle), np.sin(angle)
        t = np.eye(4, dtype=np.float32)
        t[0, 0] = c
        t[0, 2] = sn
        t[2, 0] = -sn
        t[2, 2] = c
        t[:3, 3] = (dx, dy, 0.0)
        return t

    accum = None
    for f in range(frames):
        a = 0.5 * f
        table = make_instances([xform(-0.7, 0.15 * np.sin(a), a),
                                xform(0.7, 0.15 * np.cos(a), -a)],
                               sbt_offsets=np.asarray([0, 1], np.int32),
                               prim_ranges=scene.instances.prim_ranges)
        frame_scene = scene.replace(instances=table)   # matrices only
        film = film_mod.Film.create(height, width)
        film, _ = render_accumulate(frame_scene, cam, film, width, height,
                                    samples_per_launch=samples, max_depth=2,
                                    chunk_size=None)
        accum = film.accum
    return accum


def main(argv=None):
    p = argparse.ArgumentParser(
        description="animated geometry + GAS refit (optixDynamicGeometry)")
    p.add_argument("--file", default="dynamic.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--ias", action="store_true",
                   help="animate instance matrices instead of vertices "
                        "(IAS update — geometry built once)")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    if args.ias:
        accum = render_frames_ias(w, h, args.frames)
        save_image(args.file, np.asarray(film_mod.make_color(accum)))
        print(f"wrote {args.file} (IAS mode, frame {args.frames - 1})")
        return
    base_verts, idx = make_grid_mesh()
    handle = build_gas(base_verts, idx)
    accum = None
    for f in range(args.frames):
        accum, handle = render_frame(handle, 0.4 * f, base_verts, w, h)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} (frame {args.frames - 1})")


if __name__ == "__main__":
    main()
