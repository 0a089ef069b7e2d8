"""optixCallablePrograms equivalent: pluggable shading via direct &
continuation callables dispatched by a run-time SBT index.

Reference: `SDK/optixCallablePrograms/` — three direct callables
(`__direct_callable__{phong,checkered,normal}_shade`,
`optixCallablePrograms.cu:36,75,101`) selected by the hitgroup record's
`dc_index` through `optixDirectCall` (`:123`), plus a continuation callable
shading the miss from the ray direction (`__continuation_callable__
raydir_shade`, `:128`, called at `:138`); program-group setup
`optixCallablePrograms.cpp:434-444`. The window cycles the callable.

Here the callable table is `api.callables.CallableTable` — `lax.switch`
over traced function indices, so swapping shaders at run time re-dispatches
WITHOUT recompiling (the index is a device value, exactly the SBT-record
rewrite in the reference's `--shade` cycling).
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import jax
import jax.numpy as jnp
import numpy as np

from ..api.callables import CallableTable
from ..core import film
from ..core.camera import Camera, generate_rays
from ..io.image import save_image

SHADE_NAMES = ("phong", "checkered", "normal")

# Scene: unit-ish sphere + one point and one ambient light (the sample's).
SPHERE_RADIUS = 1.5
LIGHT_POS = jnp.asarray([60.0, 40.0, 0.0])
LIGHT_COLOR = jnp.asarray([1.0, 1.0, 1.0])
AMBIENT_COLOR = jnp.asarray([0.4, 0.4, 0.4])


def phong_shade(hit_point, ray_dir, normal):
    """`__direct_callable__phong_shade` (optixCallablePrograms.cu:36-73)."""
    ka = jnp.asarray([0.2, 0.5, 0.5])
    kd = jnp.asarray([0.2, 0.7, 0.8])
    ks = jnp.asarray([0.9, 0.9, 0.9])
    l = LIGHT_POS - hit_point
    l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)
    ndl = jnp.sum(normal * l, axis=-1, keepdims=True)
    result = kd * ndl * LIGHT_COLOR
    h = l - ray_dir
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    ndh = jnp.sum(normal * h, axis=-1, keepdims=True)
    result += jnp.where(ndh > 0, ks * jnp.power(jnp.maximum(ndh, 0.0), 64.0)
                        * LIGHT_COLOR, 0.0)
    result += ka * AMBIENT_COLOR
    return result


def checkered_shade(hit_point, ray_dir, normal):
    """`__direct_callable__checkered_shade` (.cu:75-99): polar checker on
    the sphere normal, lit by |n.d| against the ambient light."""
    value = jnp.abs(jnp.sum(normal * ray_dir, axis=-1, keepdims=True))
    sn = hit_point / jnp.linalg.norm(hit_point, axis=-1, keepdims=True)
    a = jnp.arccos(jnp.clip(sn[..., 1:2], -1.0, 1.0))
    b = jnp.arctan2(sn[..., 0:1], sn[..., 2:3]) + jnp.pi
    check = ((jnp.mod(a, jnp.pi / 8) < jnp.pi / 16)
             ^ (jnp.mod(b, jnp.pi / 4) < jnp.pi / 8))
    result = jnp.where(check, AMBIENT_COLOR + value * 0.0,
                       AMBIENT_COLOR + value * 1.0)
    return jnp.clip(result, 0.0, 1.0)


def normal_shade(hit_point, ray_dir, normal):
    """`__direct_callable__normal_shade` (.cu:101-104)."""
    n = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return n * 0.5 + 0.5


def raydir_shade(ray_dir):
    """`__continuation_callable__raydir_shade` (.cu:128-132): the miss
    program's background, from the ray direction."""
    return (ray_dir + 1.0) * 0.5 * 0.3


def render(width=768, height=768, shade: int = 0):
    table = CallableTable([phong_shade, checkered_shade, normal_shade])
    miss_table = CallableTable([raydir_shade])
    cam = Camera(eye=(0.0, 0.0, 4.0), lookat=(0.0, 0.0, 0.0),
                 fov_y=60.0, aspect=width / height).params()

    @jax.jit
    def go(cam, dc_index):
        rays, _ = generate_rays(cam, width, height, jitter=False)
        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), rays)
        o, d = flat.origin, flat.direction
        # one-sphere closest hit (the sample's GAS)
        b = jnp.sum(o * d, axis=-1)
        cc = jnp.sum(o * o, axis=-1) - SPHERE_RADIUS ** 2
        disc = b * b - cc
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0.0) & (t > 1e-3)
        p = o + t[:, None] * d
        n = p / SPHERE_RADIUS
        # __closesthit__radiance: optixDirectCall(dc_index, hit, dir, n)
        shade_fn = jax.vmap(lambda hp, rd, nn:
                            table.direct_call(dc_index, hp, rd, nn))
        lit = shade_fn(p, d, n)
        # __miss__raydir: optixContinuationCall(0, ray_dir)
        bg = jax.vmap(lambda rd: miss_table.continuation_call(
            jnp.int32(0), rd))(d)
        radiance = jnp.where(hit[:, None], lit, bg)
        return film.make_color(radiance.reshape(height, width, 3))

    return go(cam, jnp.int32(shade))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="direct/continuation callables (optixCallablePrograms)")
    p.add_argument("--file", default="callable_programs.png")
    p.add_argument("--dim", default="768x768")
    p.add_argument("--shade", choices=SHADE_NAMES + ("all",),
                   default="phong",
                   help="which direct callable shades the sphere; 'all' "
                        "writes one image per callable (the window's "
                        "cycling)")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    kinds = SHADE_NAMES if args.shade == "all" else (args.shade,)
    for name in kinds:
        img = np.asarray(render(w, h, shade=SHADE_NAMES.index(name)))
        out = args.file
        if len(kinds) > 1:
            stem, dot, ext = args.file.rpartition(".")
            out = f"{stem}_{name}{dot}{ext}" if dot else f"{out}_{name}"
        save_image(out, img)
        print(f"wrote {out} ({w}x{h}, dc_index={SHADE_NAMES.index(name)})")


if __name__ == "__main__":
    main()
