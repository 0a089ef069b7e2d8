"""optixSimpleMotionBlur equivalent: time-sampled rays over moving geometry.

Reference: `SDK/optixSimpleMotionBlur/` — a motion GAS (2 keys) holding a
moving triangle and a custom motion sphere, rays carry a random time per
sample, blur accumulates progressively.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import motion
from ..core import film as film_mod, rng as _rng
from ..core.camera import Camera, generate_rays
from ..core.rays import Rays
from ..io.image import save_image


def make_scene():
    # triangle sweeping right, key 0 → key 1
    verts0 = np.array([[-1.2, -0.4, 0], [-0.4, -0.4, 0], [-0.8, 0.5, 0]],
                      np.float32)
    verts1 = verts0 + np.array([0.7, 0.0, 0.0], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    tris = motion.MotionTriangles.make(verts0, verts1, idx)
    # sphere sweeping up
    centers0 = np.array([[0.7, -0.3, 0.2]], np.float32)
    centers1 = np.array([[0.7, 0.45, 0.2]], np.float32)
    radii = np.array([0.35], np.float32)
    return tris, (jnp.asarray(centers0), jnp.asarray(centers1),
                  jnp.asarray(radii))


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_sample(tris, spheres, cam, width, height, subframe):
    n = width * height
    rng = _rng.seed(jnp.arange(n, dtype=jnp.uint32),
                    jnp.asarray(subframe, jnp.uint32))
    rng2d = rng.reshape(height, width)
    rays, rng2d = generate_rays(cam, width, height, rng_state=rng2d)
    rays = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)
    times, _ = _rng.uniform(rng2d.reshape(n))   # per-ray shutter time

    h_tri = motion.intersect_motion_triangles(tris, rays, times)
    c0, c1, rr = spheres
    h_sph = motion.intersect_motion_spheres(c0, c1, rr, rays, times)

    tri_closer = h_tri.valid & (~h_sph.valid | (h_tri.t < h_sph.t))
    sph_hit = h_sph.valid & ~tri_closer
    # flat shading: triangle orange, sphere blue-green by normal
    tri_col = jnp.asarray([0.9, 0.45, 0.1])
    sph_col = jnp.abs(h_sph.normal) * jnp.asarray([0.2, 0.7, 0.9])
    bg = jnp.asarray([0.07, 0.07, 0.10])
    radiance = jnp.where(tri_closer[:, None], tri_col,
                         jnp.where(sph_hit[:, None], sph_col, bg))
    return radiance.reshape(height, width, 3)


def render(width=512, height=512, samples=16):
    tris, spheres = make_scene()
    cam = Camera(eye=(0, 0, 3.2), lookat=(0, 0, 0), fov_y=45,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        radiance = render_sample(tris, spheres, cam, width, height,
                                 film.subframe)
        film = film.accumulate(radiance)
    return film.accum, film


def render_engine(width, height, samples):
    """Motion blur through the MAIN path tracer: the moving triangle is a
    2-key motion GAS traced with per-path shutter times inside the standard
    launch (the sample's motion options on the accel build), next to a
    static floor + area light."""
    from ..scene.device_scene import make_device_scene
    from ..shade import materials as mat
    from ..shade.lights import ParallelogramLight
    from ..wavefront.engine import render_accumulate

    verts0 = np.array([[-1.2, -0.4, 0], [-0.4, -0.4, 0], [-0.8, 0.5, 0]],
                      np.float32)
    verts1 = verts0 + np.array([1.4, 0.0, 0.0], np.float32)
    floor = np.array([[-3, -0.6, -3], [3, -0.6, -3], [3, -0.6, 3],
                      [-3, -0.6, 3]], np.float32)
    idx_f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    light = ParallelogramLight.make((-1, 3.0, -1), (2, 0, 0), (0, 0, 2),
                                    (10.0, 10.0, 10.0))
    scene = make_device_scene(
        floor, idx_f, np.zeros(2, np.int32),
        [{"kind": mat.DIFFUSE, "base_color": (0.6, 0.6, 0.65)},
         {"kind": mat.DIFFUSE, "base_color": (0.9, 0.4, 0.2)}],
        area_light=light,
        motion={"verts0": verts0, "verts1": verts1,
                "indices": np.array([[0, 1, 2]], np.int32), "tri_mat": 1})
    cam = Camera(eye=(0, 0.6, 3.2), lookat=(0, -0.1, 0), fov_y=45,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    film, _ = render_accumulate(scene, cam, film, width, height,
                                samples_per_launch=samples, max_depth=2,
                                chunk_size=None)
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(
        description="motion blur (optixSimpleMotionBlur)")
    p.add_argument("--file", default="motionblur.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--engine", action="store_true",
                   help="trace the motion GAS through the main path "
                        "tracer (per-path shutter times)")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    if args.engine:
        accum, film = render_engine(w, h, samples=args.samples)
        save_image(args.file, np.asarray(film_mod.make_color(accum)))
        print(f"wrote {args.file} (engine mode, {int(film.subframe)} "
              "time samples)")
        return
    accum, film = render(w, h, samples=args.samples)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} ({int(film.subframe)} time samples)")


if __name__ == "__main__":
    main()
