"""optixDynamicMaterials equivalent: run-time material swaps via SBT updates.

Reference: `SDK/optixDynamicMaterials/` — materials change at run time by
rewriting SBT hitgroup records / sbt offsets (`optixDynamicMaterials.cpp:
122,310,475-488`). Because the scene is a pytree, "rewriting an SBT record"
is a functional `.replace` on the material table (or on the per-triangle
material index), and the next launch just uses it — no re-link, no re-upload
choreography.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim

import jax.numpy as jnp
import numpy as np

from ..core import film as film_mod
from ..io.image import save_image
from ..scene.builtins import cornell_box, cornell_camera
from ..wavefront.engine import render_accumulate


def swap_material_color(scene, mat_id: int, new_color):
    """The `updateHitGroupRecord` analogue: functional record update."""
    table = scene.materials
    new_table = table.replace(
        base_color=table.base_color.at[mat_id].set(
            jnp.asarray(new_color, jnp.float32)))
    return scene.replace(materials=new_table)


def swap_sbt_offset(scene, tri_range, new_mat: int):
    """The sbtOffset-rewrite variant (`optixDynamicMaterials.cpp:310`):
    repoint a geometry range at a different hitgroup record."""
    lo, hi = tri_range
    return scene.replace(
        tri_mat=scene.tri_mat.at[lo:hi].set(new_mat))


def render(width=512, height=512, samples=8, phase=0):
    scene = cornell_box()
    if phase >= 1:
        scene = swap_material_color(scene, 0, (0.9, 0.7, 0.2))  # gold walls
    if phase >= 2:
        scene = swap_sbt_offset(scene, (20, 30), 2)  # tall block → red record
    cam = cornell_camera(width, height).params()
    film = film_mod.Film.create(height, width)
    film, _ = render_accumulate(scene, cam, film, width, height,
                                samples_per_launch=samples, max_depth=3,
                                chunk_size=None)
    return film.accum


def main(argv=None):
    p = argparse.ArgumentParser(
        description="run-time material swaps (optixDynamicMaterials)")
    p.add_argument("--file", default="dynmat.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--phase", type=int, default=2,
                   help="0: original, 1: recolored record, 2: +sbt-offset swap")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)
    accum = render(w, h, phase=args.phase)
    save_image(args.file, np.asarray(film_mod.make_color(accum)))
    print(f"wrote {args.file} (phase {args.phase})")


if __name__ == "__main__":
    main()
