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


def main(argv=None):
    p = argparse.ArgumentParser(
        description="animated geometry + GAS refit (optixDynamicGeometry)")
    p.add_argument("--file", default="dynamic.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--frames", type=int, default=4)
    args = p.parse_args(argv)
    w, h = (int(v) for v in args.dim.split("x"))
    base_verts, idx = make_grid_mesh()
    handle = build_gas(base_verts, idx)
    accum = None
    for f in range(args.frames):
        accum, handle = render_frame(handle, 0.4 * f, base_verts, w, h)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} (frame {args.frames - 1})")


if __name__ == "__main__":
    main()
