"""Texture-fetch primitive A/B: per-lane row gather vs block-tile one-hot.

Round-4 closed the textured-scene file with a gather-bound ceiling: the
optimized XLA path does ONE [N, 128]-f32 quad-row gather per mip level at
~15 ns per 512 B random row (~34 GB/s effective), capping the 4-tri
textured bench at ~33 Mrays/s. The round-4 verdict asked for one more
probe before accepting that as final: the LOCALITY lever — coherent ray
blocks touch a small texel footprint, so fetch each block's texel TILE
into VMEM once (dense DMA) and resolve per-lane texels with a one-hot
MXU contraction against the tile (one-hot over a few-hundred-row tile is
MXU-sized, unlike the 65k-row atlas where one-hot was measured dead).

This tool measures exactly that primitive swap on synthetic workloads
shaped like the textured bench (2M lanes, 256-lane blocks, per-block
footprints of W rows at a random atlas base):

  A) XLA per-lane quad-row gather            rows = atlas[idx]
  B) Pallas: per-block (W, 128) tile DMA (scalar-prefetch base) +
     one-hot(idx_local, W) @bf16 tile -> (256, 128) rows

If B wins at realistic footprints, next round integrates it into the
fused texture unit; if not, the negative result joins the other two in
TODO.md. Usage: python tools/bench_texfetch.py [n_rounds]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256          # lanes per coherent block (one traversal sub-block)
ROW_W = 128          # quad-row width (2x2 bilinear footprint packed)


def make_workload(n_lanes, n_rows, tile_w, seed=0):
    """Per-block coherent indices: block b reads rows in
    [base_b, base_b + tile_w)."""
    rng = np.random.default_rng(seed)
    n_blocks = n_lanes // BLOCK
    base = rng.integers(0, n_rows - tile_w, n_blocks).astype(np.int32)
    local = rng.integers(0, tile_w, (n_blocks, BLOCK)).astype(np.int32)
    idx = base[:, None] + local
    return jnp.asarray(idx.reshape(-1)), jnp.asarray(base), \
        jnp.asarray(local)


def _onehot_kernel(base_ref, tile0_ref, tile1_ref, local_ref, out_ref, *,
                   fetch_w):
    del base_ref
    # local rides in 8-step slabs (Mosaic block rule: second-to-last dim
    # divisible by 8); this step's row is rem(i, 8)
    loc = local_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1)]  # (1, BLOCK)
    tw = fetch_w // 2
    tile = jnp.concatenate([tile0_ref[...].reshape(tw, ROW_W),
                            tile1_ref[...].reshape(tw, ROW_W)], axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, fetch_w), 1)
    oh = (iota == jnp.transpose(loc, (1, 0))).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        oh, tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (BLOCK, ROW_W) f32
    out_ref[...] = rows


def onehot_fetch(atlas_bf16, tile_idx, local, tile_w, interpret=False):
    """atlas viewed as [n_rows/tile_w, tile_w, ROW_W]; block b fetches the
    2-tile window starting at tile_idx[b] (covers any tile_w-row
    footprint whose base lies in that tile); local in [0, 2*tile_w)."""
    n_blocks = tile_idx.shape[0]
    n_tiles = atlas_bf16.shape[0] // tile_w
    atlas3 = atlas_bf16.reshape(n_tiles, tile_w, ROW_W)
    fetch_w = 2 * tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            # two single-tile specs of the SAME atlas (block-index units
            # are whole blocks, so an overlapping 2-tile window needs two
            # 1-tile fetches)
            pl.BlockSpec((1, tile_w, ROW_W),
                         lambda i, sc: (sc[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_w, ROW_W),
                         lambda i, sc: (sc[i] + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLOCK), lambda i, sc: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, ROW_W), lambda i, sc: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_onehot_kernel, fetch_w=fetch_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK, ROW_W),
                                       jnp.float32),
        interpret=interpret,
    )(tile_idx, atlas3, atlas3, local.reshape(n_blocks, BLOCK))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    n_lanes = 1 << 21
    n_rows = 1 << 16          # the 65k-row atlas of the textured bench
    rng = np.random.default_rng(1)
    atlas = jnp.asarray(rng.normal(size=(n_rows, ROW_W)).astype(np.float32))
    atlas_bf = atlas.astype(jnp.bfloat16)

    def timed(name, fn):
        out = fn()
        float(jnp.sum(out[:8]))
        t0 = time.time()
        for _ in range(rounds):
            out = fn()
        float(jnp.sum(out[:8]))
        dt = (time.time() - t0) / rounds
        ns = dt / n_lanes * 1e9
        print(f"{name:44s} {dt * 1e3:7.1f} ms  {ns:6.2f} ns/lane",
              flush=True)
        return dt

    gather = jax.jit(lambda idx: atlas[idx])
    for tile_w in (128, 256, 512):
        idx, base, local = make_workload(n_lanes, n_rows, tile_w)
        # any tile_w-row footprint based anywhere inside tile k is
        # covered by the aligned 2-tile window [k*tile_w, (k+2)*tile_w)
        tile_idx = base // tile_w
        local2 = local + (base - tile_idx * tile_w)[:, None]
        t_a = timed(f"A: per-lane gather    (footprint {tile_w:4d})",
                    lambda: gather(idx))
        oh = jax.jit(functools.partial(onehot_fetch, atlas_bf,
                                       tile_w=tile_w))
        t_b = timed(f"B: tile+one-hot MXU   (footprint {tile_w:4d}, "
                    f"fetch {2 * tile_w})",
                    lambda: oh(tile_idx, local2))
        print(f"   -> B/A speedup {t_a / t_b:5.2f}x", flush=True)

    # sanity: B returns the same rows as A (f32 vs bf16 tile: compare
    # against a bf16-rounded gather)
    tile_w = 256
    idx, base, local = make_workload(n_lanes // 64, n_rows, tile_w, seed=9)
    tile_idx = base // tile_w
    local2 = local + (base - tile_idx * tile_w)[:, None]
    rows_b = onehot_fetch(atlas_bf, tile_idx, local2, tile_w)
    rows_a = atlas_bf[idx].astype(jnp.float32)
    err = float(jnp.max(jnp.abs(rows_b - rows_a)))
    print(f"# parity max |B - A_bf16| = {err:.2e} (0 expected)", flush=True)


if __name__ == "__main__":
    main()
