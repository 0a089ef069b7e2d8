"""optixMotionGeometry equivalent: SRT motion transforms over instances.

Reference: `SDK/optixMotionGeometry/` — `OptixSRTMotionTransform` keyframes
animate instances (scale/rotate/translate interpolation,
`optixMotionGeometry.cpp:568-625`). Here per-ray shutter times interpolate
the SRT, rays drop into object space, the static GAS is intersected once,
and hits come back to world space — the motion-transform traversal stack
(`optix_device.h:728-868`) in functional form.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import bruteforce as bf, motion
from ..accel.geometry import build_triangle_geometry
from ..core import film as film_mod, rng as _rng
from ..core.camera import Camera, generate_rays
from ..io.image import save_image


def make_geom():
    """A unit 'fan blade' triangle pair, to be spun by the SRT keys."""
    verts = np.array([[0, 0, 0], [1.0, 0.08, 0], [1.0, -0.08, 0],
                      [0, 0, 0], [-1.0, 0.08, 0], [-1.0, -0.08, 0]],
                     np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return build_triangle_geometry(verts, idx)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_sample(geom, key0, key1, cam, width, height, subframe):
    n = width * height
    rng = _rng.seed(jnp.arange(n, dtype=jnp.uint32),
                    jnp.asarray(subframe, jnp.uint32))
    rng2d = rng.reshape(height, width)
    rays, rng2d = generate_rays(cam, width, height, rng_state=rng2d)
    rays = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)
    times, _ = _rng.uniform(rng2d.reshape(n))

    srt = motion.srt_interpolate(key0, key1, times)
    obj_rays = motion.rays_to_object_space(rays, srt)
    hits = bf.intersect_closest(geom, obj_rays, chunk_size=None)
    hits = motion.hits_to_world_space(hits, srt)

    shade = jnp.abs(hits.normal) * jnp.asarray([0.9, 0.8, 0.3])
    bg = jnp.asarray([0.05, 0.06, 0.1])
    radiance = jnp.where(hits.valid[:, None], shade, bg)
    return radiance.reshape(height, width, 3)


def render(width=512, height=512, samples=16, spin_radians=0.6):
    geom = make_geom()
    half = spin_radians / 2
    key0 = motion.SRTKey.make(quat=(0, 0, math.sin(-half), math.cos(-half)))
    key1 = motion.SRTKey.make(quat=(0, 0, math.sin(half), math.cos(half)),
                              trans=(0.0, 0.15, 0.0))
    cam = Camera(eye=(0, 0, 3.0), lookat=(0, 0, 0), fov_y=50,
                 aspect=width / height).params()
    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        radiance = render_sample(geom, key0, key1, cam, width, height,
                                 film.subframe)
        film = film.accumulate(radiance)
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(
        description="SRT motion transforms (optixMotionGeometry)")
    p.add_argument("--file", default="motiongeom.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--samples", type=int, default=32)
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    accum, film = render(w, h, samples=args.samples)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} ({int(film.subframe)} time samples)")


if __name__ == "__main__":
    main()
