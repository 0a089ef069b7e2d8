"""optixRaycasting equivalent: headless ray casting as a compute service.

Reference: `SDK/optixRaycasting/` — no camera, no display: the app hands the
tracer a buffer of rays and gets hits back (`Ray{origin,tmin,dir,tmax}` /
`Hit{t,geom_normal}`, `optixRaycastingKernels.h:35-47`), with helper kernels
to generate orthographic ray grids, translate ray sets, and shade hits
(`createRaysOrthoOnDevice`/`translateRaysOnDevice`/`shadeHitsOnDevice`), plus
two pipelines on two streams for a scene + translated duplicate
(`optixRaycasting.cpp:294-311`). Here each helper is a jitted array program
and "two streams" is XLA's async dispatch of two independent launches.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rays import Rays
from ..scene.device_scene import DeviceScene
from ..wavefront.intersect import scene_closest
from ..io.image import save_image


@functools.partial(jax.jit, static_argnames=("width", "height", "padding"))
def create_rays_ortho(width: int, height: int, bbox_lo, bbox_hi,
                      padding: float = 0.05):
    """Orthographic ray grid over the scene AABB looking down -z
    (`createRaysOrthoOnDevice`). Returns Rays [height*width]."""
    lo = jnp.asarray(bbox_lo, jnp.float32)
    hi = jnp.asarray(bbox_hi, jnp.float32)
    extent = hi - lo
    pad = extent * padding
    lo_p = lo - pad
    hi_p = hi + pad
    xs = lo_p[0] + (jnp.arange(width) + 0.5) / width * (hi_p[0] - lo_p[0])
    ys = lo_p[1] + (jnp.arange(height) + 0.5) / height * (hi_p[1] - lo_p[1])
    gx, gy = jnp.meshgrid(xs, ys)
    origin = jnp.stack([gx, gy, jnp.full_like(gx, hi_p[2] + 1.0)], axis=-1)
    direction = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]),
                                 origin.shape)
    n = width * height
    return Rays.make(origin.reshape(n, 3), direction.reshape(n, 3),
                     tmin=0.0, tmax=1e16)


@jax.jit
def translate_rays(rays: Rays, offset):
    """`translateRaysOnDevice`: shift a ray set by a vector."""
    return rays.replace(origin=rays.origin + jnp.asarray(offset, jnp.float32))


@jax.jit
def shade_hits(hits):
    """`shadeHitsOnDevice`: normal-as-color for hit points, black for miss."""
    rgb = jnp.where(hits.valid[:, None],
                    hits.normal * 0.5 + 0.5, 0.0)
    return rgb


def cast(scene: DeviceScene, rays: Rays):
    """The service entry point: rays in → Hits out (t, prim/inst/mat ids,
    uv, normal). This is the whole product for embedding the tracer as a
    compute library."""
    return scene_closest(scene, rays)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="headless ray-casting service (optixRaycasting)")
    p.add_argument("--model", "-m", default=None, help=".gltf/.glb model")
    p.add_argument("--file", default="raycast.png")
    p.add_argument("--dim", default="512x512")
    p.add_argument("--measure-overlap", action="store_true",
                   help="time serialized vs async-dispatched launches "
                        "(the two-CUDA-streams analogue)")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)

    if args.model:
        from ..scene.scene import Scene
        host = Scene.load(args.model)
        lo, hi = host.aabb()
        scene = host.finalize()
    else:
        from ..scene.builtins import cornell_box
        scene = cornell_box()
        lo, hi = np.array([0, 0, 0.]), np.array([556, 548.8, 559.2])

    rays = create_rays_ortho(w, h, lo, hi)
    # scene + translated duplicate on "two streams": two async launches
    hits_a = cast(scene, rays)
    hits_b = cast(scene, translate_rays(rays, (0.25 * (hi - lo)[0], 0, 0)))
    img_a = shade_hits(hits_a).reshape(h, w, 3)
    img_b = shade_hits(hits_b).reshape(h, w, 3)
    img = np.asarray(jnp.concatenate([img_a, img_b], axis=1))
    save_image(args.file, (np.clip(img[::-1], 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.file} ({2 * w}x{h}, two ray sets)")

    if args.measure_overlap:
        # Demonstrate (not just claim) the two-streams analogue: JAX
        # dispatch is asynchronous, so launching both ray sets before any
        # sync pipelines host work against device work. Compare against a
        # fully serialized version (sync between launches).
        import time

        def sync(hh):
            return float(jnp.sum(hh.t))

        off = (0.25 * (hi - lo)[0], 0, 0)
        sync(cast(scene, rays))                 # warm
        t0 = time.time()
        for _ in range(5):
            a = cast(scene, rays)
            sync(a)                             # serialize
            b = cast(scene, translate_rays(rays, off))
            sync(b)
        serial = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            a = cast(scene, rays)               # both in flight
            b = cast(scene, translate_rays(rays, off))
            sync(a)
            sync(b)
        overlapped = time.time() - t0
        print(f"serialized: {serial*1e3:.1f} ms   "
              f"async-dispatch: {overlapped*1e3:.1f} ms   "
              f"overlap gain: {serial/overlapped:.2f}x")


if __name__ == "__main__":
    main()
