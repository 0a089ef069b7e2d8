"""optixVolumeViewer equivalent: fog volume + mesh composited scene.

Reference: `SDK/optixVolumeViewer/` — a NanoVDB fog volume rendered as a
custom primitive with transmittance estimation (`volume.cu:284-366`),
composited with a mesh scene. Here: a dense procedural density grid marched
in-loop, lit by a directional light through a precomputed shadow sweep,
composited over a diffuse floor.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import primitives as prim, volume as vol
from ..core import film as film_mod, rng as _rng
from ..core.camera import Camera, generate_rays
from ..io.image import save_image

LIGHT_DIR = (-0.5, -0.8, -0.33)
LIGHT_COLOR = (1.0, 0.95, 0.85)


@functools.partial(jax.jit, static_argnames=("width", "height", "num_steps"))
def render_sample(grid, floor_prims, cam, width, height, subframe,
                  num_steps=96):
    n = width * height
    rng = _rng.seed(jnp.arange(n, dtype=jnp.uint32),
                    jnp.asarray(subframe, jnp.uint32))
    rng2d = rng.reshape(height, width)
    rays, _ = generate_rays(cam, width, height, rng_state=rng2d)
    rays = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)

    # background: diffuse floor lit by the same light
    hits = prim.intersect_prims_closest(floor_prims, rays)
    ld = jnp.asarray(LIGHT_DIR)
    ld = ld / jnp.linalg.norm(ld)
    ndl = jnp.maximum((-ld * hits.normal).sum(-1), 0.0)
    floor_col = jnp.asarray([0.45, 0.42, 0.38])
    sky = jnp.asarray([0.25, 0.35, 0.55])
    bg = jnp.where(hits.valid[:, None],
                   floor_col * (0.15 + 0.85 * ndl[:, None]), sky)
    bg_t = jnp.where(hits.valid, hits.t, rays.tmax)

    rad, trans = vol.march(grid, rays, LIGHT_DIR, jnp.asarray(LIGHT_COLOR),
                           sigma_t=10.0, num_steps=num_steps,
                           bg_radiance=bg, bg_t=bg_t)
    return rad.reshape(height, width, 3)


def _normalized_grid(grid):
    """Rescale a loaded grid into the viewer's unit stage: longest world
    edge -> 2 units, centered at the origin resting near the floor (the
    reference frames the camera from the grid's world AABB instead;
    `optixVolumeViewer.cpp:700-716`)."""
    span = grid.hi - grid.lo
    s = 2.0 / jnp.max(span)
    half = span * s * 0.5
    lo = jnp.stack([-half[0], -1.0 + 0.02, -half[2]])
    return vol.DensityGrid(density=grid.density, lo=lo, hi=lo + span * s)


def load_grid(path: str, grid_name=None, res: int = 64):
    """Density grid for the stage: a .nvdb file (NanoVDB fog volume,
    `optixVolumeViewer.cpp:641-678`) or the procedural demo puffball."""
    if path:
        from ..io.nanovdb import load_density_grid
        return _normalized_grid(load_density_grid(path, grid_name))
    return vol.pyroclastic_ball(res=res)


def render(width=512, height=512, samples=4, res=64, num_steps=96,
           grid_file=None, grid_name=None):
    grid = load_grid(grid_file, grid_name, res=res)
    floor = prim.make_prims([
        {"kind": prim.PARALLELOGRAM, "anchor": (-6.0, -1.05, -6.0),
         "v1": (12.0, 0, 0), "v2": (0, 0, 12.0)}])
    cam = Camera(eye=(2.2, 0.8, 3.2), lookat=(0, -0.1, 0), fov_y=40,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        radiance = render_sample(grid, floor, cam, width, height,
                                 film.subframe, num_steps=num_steps)
        film = film.accumulate(radiance)
    return film.accum, film


def render_engine(width, height, samples, res=48, max_depth=3,
                  grid_file=None, grid_name=None):
    """Mesh + volume through the MAIN path tracer: a pyroclastic cloud
    inside the Cornell box rendered by render_accumulate — the composited
    mesh+volume scene of the reference (`volume.cu:284-366` inside the
    standard launch), with transmittance-weighted NEE."""
    from ..scene.builtins import (CORNELL_LIGHT_CORNER, CORNELL_LIGHT_V1,
                                  CORNELL_LIGHT_V2, CORNELL_LIGHT_EMISSION,
                                  CORNELL_MATERIALS, _CORNELL_QUADS,
                                  cornell_camera, quads_to_triangles)
    from ..scene.device_scene import make_device_scene
    from ..shade.lights import ParallelogramLight
    from ..wavefront.engine import render_accumulate

    verts, idx, tri_mat = quads_to_triangles(_CORNELL_QUADS)
    ball = load_grid(grid_file, grid_name, res=res)
    # place the volume inside the box, preserving its aspect
    span = ball.hi - ball.lo
    s = 280.0 / jnp.max(span)
    lo = jnp.asarray([140.0, 80.0, 150.0])
    cloud = vol.DensityGrid(density=ball.density, lo=lo, hi=lo + span * s)
    light = ParallelogramLight.make(CORNELL_LIGHT_CORNER, CORNELL_LIGHT_V1,
                                    CORNELL_LIGHT_V2, CORNELL_LIGHT_EMISSION)
    scene = make_device_scene(verts, idx, tri_mat, CORNELL_MATERIALS,
                              area_light=light, volume=cloud,
                              volume_sigma=0.02, volume_albedo=0.95)
    cam = cornell_camera(width, height).params()
    film = film_mod.Film.create(height, width)
    film, _ = render_accumulate(scene, cam, film, width, height,
                                samples_per_launch=samples,
                                max_depth=max_depth, chunk_size=None)
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(description="fog volume (optixVolumeViewer)")
    p.add_argument("--file", default="volume.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--res", type=int, default=64, help="grid resolution")
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--grid", default=None, metavar="FILE.nvdb",
                   help="NanoVDB fog-volume file (reference: --volume "
                        "volume.nvdb); default: procedural puffball")
    p.add_argument("--grid-name", default=None,
                   help="grid to pick from a multi-grid .nvdb")
    p.add_argument("--engine", action="store_true",
                   help="render a mesh+volume Cornell through the main "
                        "path tracer (transmittance-weighted NEE)")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    if args.engine:
        accum, film = render_engine(w, h, samples=args.samples,
                                    res=min(args.res, 64),
                                    grid_file=args.grid,
                                    grid_name=args.grid_name)
        save_image(args.file, np.asarray(film_mod.make_color(accum)))
        print(f"wrote {args.file} (engine mode: Cornell + cloud)")
        return
    accum, film = render(w, h, samples=args.samples, res=args.res,
                         num_steps=args.steps, grid_file=args.grid,
                         grid_name=args.grid_name)
    src = args.grid or f"grid {args.res}^3"
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} ({src}, {args.steps} steps)")


if __name__ == "__main__":
    main()
