"""optixHair equivalent: hair strands with strand-u / segment / index shading.

Reference: `SDK/optixHair/` — `.hair` files → curve GAS per spline mode,
with strand-u / segment-u / strand-index closest-hit shading variants
(`optixHair.cu`). Loads real `.hair` files when given, else generates a
procedural fur patch. Shading mode picks how the capsule hit's u parameter
and prim index map to color (the sample's three CH programs).
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import curves as cv, primitives as prim
from ..core import film as film_mod, rng as _rng
from ..core.camera import Camera, generate_rays
from ..io.image import save_image


def procedural_fur(num_strands=120, segs=6, seed=0):
    """Fur patch: strands growing from a disk, curling with noise."""
    rng = np.random.default_rng(seed)
    strands, radii = [], []
    for _ in range(num_strands):
        r = np.sqrt(rng.uniform(0, 1)) * 0.8
        phi = rng.uniform(0, 2 * np.pi)
        base = np.array([r * np.cos(phi), -0.5, r * np.sin(phi)])
        pts = [base]
        d = np.array([0.0, 1.0, 0.0])
        for _s in range(segs):
            d = d + 0.35 * rng.normal(size=3)
            d[1] = abs(d[1]) * 0.8 + 0.2
            d /= np.linalg.norm(d)
            pts.append(pts[-1] + 0.18 * d)
        strands.append(np.asarray(pts, np.float32))
        radii.append(np.linspace(0.012, 0.004, segs + 1).astype(np.float32))
    return strands, radii


def build_prims(strands, radii, spline=cv.LINEAR, samples_per_segment=4,
                swept=False):
    descs = []
    strand_of = []
    for si, (pts, rad) in enumerate(zip(strands, radii)):
        if swept and spline in (cv.CUBIC_BSPLINE, cv.CATMULL_ROM,
                                cv.BEZIER) and len(pts) >= 4:
            # true swept cubic spans of the requested basis
            segs = cv.strand_to_swept_cubics(pts, rad, kind=spline,
                                             mat_id=0)
        elif swept and len(pts) >= 3:
            # true swept quadratic spans (no capsule facets on silhouettes)
            segs = cv.strand_to_swept_quads(pts, rad, mat_id=0)
        else:
            if spline != cv.LINEAR and len(pts) >= 4:
                pts, rad, _ = cv.eval_spline(pts, rad, spline,
                                             samples_per_segment)
            segs = cv.strand_to_capsules(pts, rad, mat_id=0)
        descs.extend(segs)
        strand_of.extend([si] * len(segs))
    return prim.make_prims(descs), np.asarray(strand_of, np.int32)


def render(width=512, height=512, hair_file=None, shading="strand_u",
           spline=cv.LINEAR, samples=4, swept=False):
    if hair_file:
        strands, radii = cv.load_hair_file(hair_file)
    else:
        strands, radii = procedural_fur()
    prims, strand_of = build_prims(strands, radii, spline, swept=swept)
    strand_of = jnp.asarray(strand_of)
    num_strands = len(strands)
    cam = Camera(eye=(0, 0.35, 2.6), lookat=(0, 0.15, 0), fov_y=40,
                 aspect=width / height).params()

    def shade(hits):
        u = hits.uv[..., 0]
        pid = jnp.maximum(hits.prim_id, 0)
        sid = strand_of[pid].astype(jnp.float32)
        if shading == "strand_u":        # green→red along the strand
            col = jnp.stack([u, 1.0 - u, 0.2 * jnp.ones_like(u)], -1)
        elif shading == "segment_u":     # u within each capsule
            col = jnp.stack([u, u, jnp.ones_like(u)], -1)
        else:                            # strand_idx: hash strand id → hue
            h = (sid * 0.61803) % 1.0
            col = jnp.stack([h, 1.0 - h, 0.5 + 0.5 * jnp.sin(7.0 * h)], -1)
        n_dl = jnp.maximum(
            (hits.normal * jnp.asarray([0.3, 0.8, 0.52])).sum(-1), 0.15)
        return col * n_dl[..., None]

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def sample(subframe):
        n = width * height
        rng = _rng.seed(jnp.arange(n, dtype=jnp.uint32),
                        jnp.asarray(subframe, jnp.uint32))
        rng2d = rng.reshape(height, width)
        rays, _ = generate_rays(cam, width, height, rng_state=rng2d)
        rays = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)
        hits = prim.intersect_prims_closest(prims, rays)
        bg = jnp.asarray([0.1, 0.1, 0.13])
        radiance = jnp.where(hits.valid[:, None], shade(hits), bg)
        return radiance.reshape(height, width, 3)

    film = film_mod.Film.create(height, width)
    for _ in range(samples):
        film = film.accumulate(sample(film.subframe))
    return film.accum, film


def main(argv=None):
    p = argparse.ArgumentParser(description="hair rendering (optixHair)")
    p.add_argument("--file", default="hair.png")
    p.add_argument("--hair", default=None, help=".hair input file")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--shading", default="strand_u",
                   choices=["strand_u", "segment_u", "strand_idx"])
    p.add_argument("--spline", default=cv.LINEAR,
                   choices=[cv.LINEAR, cv.CUBIC_BSPLINE, cv.CATMULL_ROM])
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--swept", action="store_true",
                   help="true swept spans instead of capsules (cubic for "
                        "cubic/catmullrom/bezier splines, else quadratic)")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    accum, film = render(w, h, hair_file=args.hair, shading=args.shading,
                         spline=args.spline, samples=args.samples,
                         swept=args.swept)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} ({args.shading}, {args.spline})")


if __name__ == "__main__":
    main()
