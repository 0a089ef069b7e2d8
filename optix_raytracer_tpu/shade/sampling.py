"""Sampling routines: cosine hemisphere, uniform disk/sphere, GGX.

Replaces the device-side sampling helpers of the reference: cosine-hemisphere
via concentric disk mapping (`SDK/cuda/random.h` users +
`SDK/optixPathTracer/optixPathTracer.cu:84-100` cosine_sample_hemisphere) and
the GGX importance sampling implicit in the whitted PBR closest-hit
(`SDK/cuda/whitted.cu:149-289`). All functions are batched jnp, branchless.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import normalize, orthonormal_basis

TWO_PI = 6.283185307179586


def concentric_sample_disk(u1, u2):
    """Shirley–Chiu concentric disk mapping (low distortion, branchless)."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    x_major = jnp.abs(ox) > jnp.abs(oy)
    # r keeps the SIGN of the major component — that is what spreads samples
    # over all four quadrants.
    r = jnp.where(x_major, ox, oy)
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    theta = jnp.where(
        x_major,
        (jnp.pi / 4.0) * (oy / safe_ox),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (ox / safe_oy),
    )
    r = jnp.where((ox == 0.0) & (oy == 0.0), 0.0, r)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cosine_sample_hemisphere(u1, u2, normal):
    """Cosine-weighted direction about `normal`; pdf = cosθ/π.

    The `cosine_sample_hemisphere` + Onb pattern of
    `optixPathTracer.cu:84-100,370-373`, using the branchless ONB from
    core.vecmath.
    """
    dx, dy = concentric_sample_disk(u1, u2)
    dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    t, b = orthonormal_basis(normal)
    return normalize(dx[..., None] * t + dy[..., None] * b + dz[..., None] * normal)


def uniform_sample_sphere(u1, u2):
    """Uniform direction on the unit sphere."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def ggx_sample_half_vector(u1, u2, normal, roughness):
    """Sample a GGX/Trowbridge-Reitz half-vector about `normal`.

    pdf_h = D(h)·cosθ_h. Matches the NDF used by the whitted PBR closest-hit
    (`SDK/cuda/whitted.cu:170-214` GGX terms).
    """
    a2 = (roughness * roughness)
    cos2 = (1.0 - u1) / jnp.maximum(u1 * (a2 * a2 - 1.0) + 1.0, 1e-12)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos2))
    phi = TWO_PI * u2
    t, b = orthonormal_basis(normal)
    return normalize(
        (sin_t * jnp.cos(phi))[..., None] * t
        + (sin_t * jnp.sin(phi))[..., None] * b
        + cos_t[..., None] * normal)


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (β = 2)."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)
