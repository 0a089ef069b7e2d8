"""optixTriangle equivalent: one-triangle GAS, pinhole camera, barycentric
closest-hit shading, miss = gradient background.

Reference: `SDK/optixTriangle/optixTriangle.{cpp,cu}` — GAS over a single
triangle, `__raygen__rg` pinhole rays, `__closesthit__ch` writing barycentrics
as RGB, `__miss__ms` writing a constant background. The whole module/pipeline/
SBT ritual is one jitted render function here; the "SBT" is the pair of shade
branches fused into the same program.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import bruteforce as bf
from ..accel.geometry import build_triangle_geometry
from ..core import film
from ..core.camera import Camera, generate_rays
from ..io.image import save_image, to_ascii

# The classic single triangle of the sample, in world units.
TRIANGLE_VERTICES = np.array(
    [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]], np.float32)
MISS_COLOR = np.array([0.0, 0.1, 0.3], np.float32)  # sample's gradient base


def make_camera(width, height):
    return Camera(eye=(0.0, 0.0, 2.0), lookat=(0.0, 0.0, 0.0),
                  up=(0.0, 1.0, 0.0), fov_y=45.0, aspect=width / height)


def render(width=768, height=768):
    """Returns uint8 RGBA [H, W, 4]."""
    geom = build_triangle_geometry(jnp.asarray(TRIANGLE_VERTICES),
                                   jnp.asarray([[0, 1, 2]], jnp.int32))
    cam = make_camera(width, height).params()

    @jax.jit
    def go(geom, cam):
        rays, _ = generate_rays(cam, width, height, jitter=False)
        hits = bf.intersect_closest(geom, rays)
        # Closest-hit: RGB = (u, v, 1-u-v) barycentrics (optixTriangle.cu CH).
        u, v = hits.uv[..., 0], hits.uv[..., 1]
        ch = jnp.stack([u, v, jnp.clip(1.0 - u - v, 0.0, 1.0)], axis=-1)
        miss = jnp.broadcast_to(jnp.asarray(MISS_COLOR), ch.shape)
        radiance = jnp.where(hits.valid[..., None], ch, miss)
        return film.make_color(radiance)

    return go(geom, cam)


def main(argv=None):
    p = argparse.ArgumentParser(description="one-triangle render (optixTriangle)")
    p.add_argument("--file", default="triangle.png")
    p.add_argument("--dim", default="768x768")
    p.add_argument("--ascii", action="store_true")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    img = np.asarray(render(w, h))
    save_image(args.file, img)
    if args.ascii:
        print(to_ascii(img))
    print(f"wrote {args.file} ({w}x{h})")


if __name__ == "__main__":
    main()
