"""optixSphere equivalent: one built-in sphere primitive, normal-shaded.

Reference: `SDK/optixSphere/` — sphere GAS via `optixBuiltinISModuleGet`
(`include/optix_host.h:409`), closest-hit shading the unit normal.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import primitives as prim
from ..core import film
from ..core.camera import Camera, generate_rays
from ..io.image import save_image


def render(width=768, height=768):
    # The builtin-IS module pairing of the reference: module provides the
    # sphere __intersection__ program, make_primitives the GAS build input.
    from ..api.module import builtin_is_module
    is_mod = builtin_is_module("sphere")
    prims = is_mod.make_primitives([(0.0, 0.0, 0.0)], [1.5])
    intersect = is_mod.get("__intersection__sphere")
    cam = Camera(eye=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                 fov_y=60.0, aspect=width / height).params()

    @jax.jit
    def go(prims, cam):
        rays, _ = generate_rays(cam, width, height, jitter=False)
        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), rays)
        hits = intersect(prims, flat)
        # CH: color = normal * 0.5 + 0.5 (the sample's shading)
        shade = hits.normal * 0.5 + 0.5
        miss = jnp.asarray([0.0, 0.0, 0.0])
        radiance = jnp.where(hits.valid[:, None], shade, miss)
        return film.make_color(radiance.reshape(height, width, 3))

    return go(prims, cam)


def main(argv=None):
    p = argparse.ArgumentParser(description="one-sphere render (optixSphere)")
    p.add_argument("--file", default="sphere.png")
    p.add_argument("--dim", default="768x768")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    save_image(args.file, np.asarray(render(w, h)))
    print(f"wrote {args.file} ({w}x{h})")


if __name__ == "__main__":
    main()
