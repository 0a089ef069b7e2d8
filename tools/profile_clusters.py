"""Stage-level profiling of the cluster traversal on the real TPU chip.

Times each stage of accel/clusters.py closest_hit separately on the
25k-triangle knot bench scene: cull kernel, list compaction/sort, walk
kernel, and the end-to-end closest_hit, plus an incoherent (bounce-like)
ray distribution. Run: python tools/profile_clusters.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from optix_raytracer_tpu.accel import clusters as cl
from optix_raytracer_tpu.accel import native
from optix_raytracer_tpu.accel.geometry import build_triangle_geometry
from optix_raytracer_tpu.core.camera import generate_rays
from optix_raytracer_tpu.core.rays import Rays
from optix_raytracer_tpu.scene.builtins import knot_camera, trefoil_mesh

W, H = 1920, 1088


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n, r


def tile_order(w, h, tile=16):
    """Pixel permutation putting each tile's pixels contiguous."""
    ty, tx = np.meshgrid(np.arange(h // tile), np.arange(w // tile),
                         indexing="ij")
    py, px = np.meshgrid(np.arange(tile), np.arange(tile), indexing="ij")
    yy = (ty[:, :, None, None] * tile + py[None, None]).ravel()
    xx = (tx[:, :, None, None] * tile + px[None, None]).ravel()
    return jnp.asarray(yy * w + xx, jnp.int32)


def main():
    print("devices:", jax.devices())
    verts, idx, normals = trefoil_mesh(200, 63)
    geom = build_triangle_geometry(verts, idx, normals=normals)
    cs = cl.build_clusters(geom, jnp.zeros((geom.num_triangles,), jnp.int32),
                           order=native.sah_leaf_order(geom))
    cs = jax.tree.map(jax.block_until_ready, cs)
    print(f"clusters: {cs.num_clusters}  rows: {cs.num_rows}")

    rays, _ = generate_rays(knot_camera(W, H).params(), W, H,
                            rng_state=None, jitter=False)
    flat = jax.tree.map(lambda a: a.reshape((W * H,) + a.shape[2:]), rays)
    order = tile_order(W, H)
    coh = jax.tree.map(lambda a: a[order], flat)
    coh = jax.tree.map(jax.block_until_ready, coh)
    n = W * H
    mray = n / 1e6

    n_padded = -(-n // cl.SUPER) * cl.SUPER
    n_super = n_padded // cl.SUPER
    c_pad = cs.num_rows * cl.LANES

    pack = jax.jit(lambda r: cl._pack_rays(r, n_padded))
    t_pack, packed = timeit(pack, coh)
    print(f"pack:         {t_pack*1e3:8.2f} ms")

    cull = jax.jit(lambda c, p: cl._cull(c, p, n_super, c_pad, False))
    t_cull, (counts, lists, tnear) = timeit(cull, cs, packed)
    print(f"cull+sort:    {t_cull*1e3:8.2f} ms")

    t_closest, hits = timeit(
        lambda c, r: cl.closest_hit(c, r), cs, coh)
    print(f"closest e2e:  {t_closest*1e3:8.2f} ms  "
          f"=> {mray/t_closest:7.1f} Mrays/s")

    t_any, occ = timeit(lambda c, r: cl.any_hit(c, r), cs, coh)
    print(f"any e2e:      {t_any*1e3:8.2f} ms  => {mray/t_any:7.1f} Mrays/s")

    # null kernel call: measures per-call dispatch/tunnel constant
    f = jax.jit(lambda x: x + 1.0)
    t_null, _ = timeit(f, packed)
    print(f"null jit:     {t_null*1e3:8.2f} ms")

    st = cl.traversal_stats(cs, coh)
    print("stats coherent:", {k: round(v, 2) for k, v in st.items()})

    # Incoherent: bounce-like rays from the surface in random directions
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    lo = jnp.min(verts, axis=0)
    hi = jnp.max(verts, axis=0)
    o = jax.random.uniform(k1, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    inc = Rays(origin=o, direction=d,
               tmin=jnp.full((n,), 1e-3), tmax=jnp.full((n,), 1e30))
    inc = jax.tree.map(jax.block_until_ready, inc)
    t_inc, _ = timeit(lambda c, r: cl.closest_hit(c, r), cs, inc, n=5)
    print(f"incoherent:   {t_inc*1e3:8.2f} ms  => {mray/t_inc:7.1f} Mrays/s")
    st = cl.traversal_stats(cs, inc)
    print("stats incoherent:", {k: round(v, 2) for k, v in st.items()})

    t_incs, _ = timeit(lambda c, r: cl.closest_hit_sorted(c, r), cs, inc,
                       n=5)
    print(f"incoh+sort:   {t_incs*1e3:8.2f} ms  => {mray/t_incs:7.1f} "
          "Mrays/s")

    # Realistic bounce rays: cosine-hemisphere directions from the primary
    # hit points (what depth-1 of the path tracer actually traces).
    hits = jax.block_until_ready(cl.closest_hit(cs, coh))
    p = coh.origin + coh.direction * hits.t[:, None] * 0.999
    nrm = hits.normal
    k3, k4 = jax.random.split(k1)
    u1 = jax.random.uniform(k3, (n,))
    u2 = jax.random.uniform(k4, (n,))
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    tang = jnp.cross(nrm, jnp.where(jnp.abs(nrm[:, 0:1]) < 0.9,
                                    jnp.array([1.0, 0, 0]),
                                    jnp.array([0, 1.0, 0])))
    tang = tang / jnp.maximum(jnp.linalg.norm(tang, axis=1, keepdims=True),
                              1e-12)
    bit = jnp.cross(nrm, tang)
    d2 = (tang * (r * jnp.cos(phi))[:, None]
          + bit * (r * jnp.sin(phi))[:, None]
          + nrm * jnp.sqrt(jnp.maximum(1 - u1, 0.0))[:, None])
    bounce = Rays(origin=p, direction=d2,
                  tmin=jnp.full((n,), 1e-3), tmax=jnp.full((n,), 1e30))
    bounce = jax.tree.map(jax.block_until_ready, bounce)
    t_b, _ = timeit(lambda c, r: cl.closest_hit(c, r), cs, bounce, n=5)
    print(f"bounce:       {t_b*1e3:8.2f} ms  => {mray/t_b:7.1f} Mrays/s")
    t_bs, _ = timeit(lambda c, r: cl.closest_hit_sorted(c, r), cs, bounce,
                     n=5)
    print(f"bounce+sort:  {t_bs*1e3:8.2f} ms  => {mray/t_bs:7.1f} Mrays/s")
    sb = jax.tree.map(lambda a: a[cl._coherence_perm(cs, bounce)], bounce)
    st = cl.traversal_stats(cs, sb)
    print("stats bounce+sort:", {k: round(v, 2) for k, v in st.items()})


if __name__ == "__main__":
    main()
