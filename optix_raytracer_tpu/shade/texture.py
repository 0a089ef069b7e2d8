"""Texture sampling: bilinear + trilinear-mipmap lookup into the mip atlas.

Replaces `cudaTextureObject_t` sampling in the PBR closest-hit
(`SDK/cuda/whitted.cu:160-168` sampleTexture, `MaterialData.h:62-73`). TPU has
no texture units, so this is four gathers + a lerp per level — SURVEY.md §7
hard part #4. Wrap addressing, linear filtering; texel centers at
half-integer uv like CUDA's normalized-coordinate linear mode. Mip level
selection uses the ray-cone footprint (cone width x per-triangle uv
density), the standard RT substitute for raster derivatives.
"""
from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(textures, tex_size, tex_id, uv):
    """textures: [T, H, W, 4]; tex_size: [T, 2]; tex_id: [...] i32 (-1 = none
    → white); uv: [..., 2]. Returns RGBA [..., 4]."""
    tid = jnp.maximum(tex_id, 0)
    hw = tex_size[tid].astype(jnp.float32)          # [..., 2] (h, w)
    h, w = hw[..., 0], hw[..., 1]

    # wrap addressing, texel centers at (i + 0.5)
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def texel(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), jnp.maximum(w.astype(jnp.int32), 1))
        yi = jnp.mod(yi.astype(jnp.int32), jnp.maximum(h.astype(jnp.int32), 1))
        return textures[tid, yi, xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    rgba = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)
    return jnp.where((tex_id >= 0)[..., None], rgba,
                     jnp.ones_like(rgba))


def _sample_level(textures, tex_mip, tid, uv, level):
    """Bilinear fetch from one mip level of the atlas (wrap addressing
    inside the level's (y, x, h, w) window)."""
    entry = tex_mip[tid, level].astype(jnp.float32)     # [..., 4] y x h w
    y_off, x_off = entry[..., 0], entry[..., 1]
    h = jnp.maximum(entry[..., 2], 1.0)
    w = jnp.maximum(entry[..., 3], 1.0)

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def texel(xi, yi):
        xi = jnp.mod(xi, w).astype(jnp.int32) + x_off.astype(jnp.int32)
        yi = jnp.mod(yi, h).astype(jnp.int32) + y_off.astype(jnp.int32)
        return textures[tid, yi, xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def sample_trilinear(textures, tex_mip, tex_id, uv, texel_scale=None):
    """Trilinear mipmapped fetch → RGBA [..., 4] (tex_id -1 → white).

    texel_scale: per-sample world-space footprint x uv-density (ray-cone
    width x triangle uv density). lod = log2(footprint in level-0 texels);
    None or 0 degrades to level-0 bilinear.
    """
    tid = jnp.maximum(tex_id, 0)
    n_levels = tex_mip.shape[1]
    if texel_scale is None or n_levels == 1:
        lod = jnp.zeros(uv.shape[:-1], jnp.float32)
    else:
        dim0 = jnp.maximum(tex_mip[tid, 0, 2],
                           tex_mip[tid, 0, 3]).astype(jnp.float32)
        lod = jnp.log2(jnp.maximum(texel_scale * dim0, 1.0))
    # clamp to each texture's own chain length (h = 0 marks past-the-end)
    chain_len = jnp.sum((tex_mip[tid, :, 2] > 0).astype(jnp.float32),
                        axis=-1)
    lod = jnp.clip(lod, 0.0, chain_len - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, (chain_len - 1.0).astype(jnp.int32))
    f = (lod - l0.astype(jnp.float32))[..., None]
    rgba = ((1.0 - f) * _sample_level(textures, tex_mip, tid, uv, l0)
            + f * _sample_level(textures, tex_mip, tid, uv, l1))
    return jnp.where((tex_id >= 0)[..., None], rgba, jnp.ones_like(rgba))
