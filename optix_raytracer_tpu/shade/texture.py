"""Texture sampling: bilinear lookup into the padded texture stack.

Replaces `cudaTextureObject_t` sampling in the PBR closest-hit
(`SDK/cuda/whitted.cu:160-168` sampleTexture, `MaterialData.h:62-73`). TPU has
no texture units, so this is four gathers + a lerp — SURVEY.md §7 hard part
#4. Wrap addressing, linear filtering; texel centers at half-integer uv like
CUDA's normalized-coordinate linear mode.
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
