"""Fully-fused Pallas path-trace kernel: raygen→trace→shade→NEE→RR in VMEM.

The endgame of the wavefront design (SURVEY.md §7 "hard part #2"): per grid
step, a block of 1024 pixels runs its *entire* progressive sample — camera ray
generation, the closest-hit loop over SMEM triangle constants, branchless
material shading, NEE shadow ray + area-light weight, cosine/specular bounce
sampling and Russian roulette — without any state ever leaving VMEM. HBM
traffic is 12 B per pixel (the radiance sum out); everything else is VPU
compute. This is the OptiX megakernel (`optixLaunch` → `__raygen__rg` loop,
`SDK/optixPathTracer/optixPathTracer.cu:249-320`) reborn as a lock-step
vector program instead of a divergent thread program.

RNG parity: the kernel consumes the exact same TEA-seeded counter-hash stream
(core/rng.py) in the exact same order as the XLA engine
(wavefront/engine.py), so both paths produce the same image up to f32
reassociation — the XLA engine doubles as this kernel's oracle in tests.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.pallas_bf import (BLOCK_RAYS, LANES, SUBLANES, _DEGEN_EPS,
                               _load_tri, _tri_test)
from ..scene.device_scene import DeviceScene
from .engine import RAY_TMIN, SHADOW_TMAX_SCALE

_U32 = jnp.uint32
_TWO_PI = 6.283185307179586


# ---------------------------------------------------------------------------
# In-kernel RNG — bit-identical to core/rng.py, but carried as int32 because
# Mosaic lacks uint32↔float32 casts. Two's-complement mul/add/xor match uint32
# arithmetic bit-for-bit; right shifts go through shift_right_logical.
# ---------------------------------------------------------------------------

def _c32(v: int):
    """uint32 literal as a wrapped int32 constant."""
    return jnp.int32(v - (1 << 32) if v >= (1 << 31) else v)


def _shr(x, n: int):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _tea(v0, v1):
    s0 = jnp.int32(0)
    for _ in range(4):
        s0 = s0 + _c32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + _c32(0xA341316C)) ^ (v1 + s0)
                   ^ (_shr(v1, 5) + _c32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + _c32(0xAD90777D)) ^ (v0 + s0)
                   ^ (_shr(v0, 5) + _c32(0x7E95761E)))
    return v0


def _uniform(state):
    new_state = state * _c32(747796405) + _c32(2891336453)
    x = new_state
    x = (x ^ _shr(x, 16)) * _c32(0x7FEB352D)
    x = (x ^ _shr(x, 15)) * _c32(0x846CA68B)
    x = x ^ _shr(x, 16)
    # top-24-bit float: after a logical shift by 8 the value is positive in
    # int32, so a plain int→float convert is exact.
    return _shr(x, 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0), new_state


def _uniform2(state):
    u1, state = _uniform(state)
    u2, state = _uniform(state)
    return u1, u2, state


def _advance2(state):
    """Advance the stream by two draws without computing outputs — keeps the
    sequence aligned with the XLA engine when a draw's consumer is statically
    elided (e.g. the glass branch in diffuse-only scenes)."""
    for _ in range(2):
        state = state * _c32(747796405) + _c32(2891336453)
    return state


# ---------------------------------------------------------------------------
# Small vector helpers on component triples
# ---------------------------------------------------------------------------

def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(_dot3(x, y, z, x, y, z), 1e-20))
    return x * inv, y * inv, z * inv


def _onb(nx, ny, nz):
    """Branchless Frisvad/Duff ONB (matches core.vecmath.orthonormal_basis)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tx, ty, tz = 1.0 + sign * nx * nx * a, sign * b, -sign * nx
    bx, by, bz = b, sign + ny * ny * a, -ny
    return (tx, ty, tz), (bx, by, bz)


def _pbr_brdf3(nx, ny, nz, wox, woy, woz, wix, wiy, wiz,
               ar, ag, ab, metallic, rough):
    """Component-wise metallic-roughness BRDF — bit-matches engine._pbr_brdf
    (lambert*(1-metal) + Smith-Schlick GGX, f0 = lerp(0.04, albedo, m))."""
    pi = jnp.float32(np.pi)
    hx, hy, hz = _normalize3(wox + wix, woy + wiy, woz + wiz)
    n_dl = jnp.maximum(_dot3(nx, ny, nz, wix, wiy, wiz), 0.0)
    n_dv = jnp.maximum(_dot3(nx, ny, nz, wox, woy, woz), 1e-4)
    n_dh = jnp.maximum(_dot3(nx, ny, nz, hx, hy, hz), 0.0)
    h_dv = jnp.maximum(_dot3(hx, hy, hz, wox, woy, woz), 0.0)
    rc = jnp.maximum(rough, 0.05)
    a = rc * rc
    a2 = a * a
    denom = n_dh * n_dh * (a2 - 1.0) + 1.0
    d_term = a2 / jnp.maximum(pi * denom * denom, 1e-8)
    k = (rc + 1.0) ** 2 / 8.0
    g = (n_dv / (n_dv * (1 - k) + k)) * (n_dl / jnp.maximum(
        n_dl * (1 - k) + k, 1e-8))
    one_m5 = (1.0 - h_dv) ** 5
    spec_s = d_term * g / jnp.maximum(4.0 * n_dv * n_dl, 1e-8)
    inv_pi = jnp.float32(1.0 / np.pi)
    lit = n_dl > 0

    def chan(alb):
        f0 = 0.04 * (1.0 - metallic) + metallic * alb
        fres = f0 + (1.0 - f0) * one_m5
        f = alb * (1.0 - metallic) * inv_pi + fres * spec_s
        return jnp.where(lit, f, 0.0)

    return chan(ar), chan(ag), chan(ab)


def _pbr_pdf3(nx, ny, nz, wox, woy, woz, wix, wiy, wiz, rough, p_spec):
    """One-sample-MIS pdf of the cosine+GGX mixture (engine._pbr_pdf)."""
    pi = jnp.float32(np.pi)
    hx, hy, hz = _normalize3(wox + wix, woy + wiy, woz + wiz)
    n_dl = jnp.maximum(_dot3(nx, ny, nz, wix, wiy, wiz), 0.0)
    n_dh = jnp.maximum(_dot3(nx, ny, nz, hx, hy, hz), 0.0)
    h_dv = jnp.maximum(_dot3(hx, hy, hz, wox, woy, woz), 1e-6)
    rc = jnp.maximum(rough, 0.05)
    a = rc * rc
    a2 = a * a
    denom = n_dh * n_dh * (a2 - 1.0) + 1.0
    d_term = a2 / jnp.maximum(pi * denom * denom, 1e-8)
    pdf_ggx = d_term * n_dh / jnp.maximum(4.0 * h_dv, 1e-8)
    pdf_cos = n_dl / pi
    return p_spec * pdf_ggx + (1.0 - p_spec) * pdf_cos


def _ggx_sample_half(u1, u2, nx, ny, nz, rough):
    """GGX half-vector about n — matches shade.sampling.ggx_sample_half_vector
    (called with roughness already clamped to >= 0.05)."""
    a2 = rough * rough
    cos2 = (1.0 - u1) / jnp.maximum(u1 * (a2 * a2 - 1.0) + 1.0, 1e-12)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos2))
    phi = jnp.float32(_TWO_PI) * u2
    (tx, ty, tz), (bx, by, bz) = _onb(nx, ny, nz)
    cp = jnp.cos(phi)
    sp = jnp.sin(phi)
    hx = sin_t * cp * tx + sin_t * sp * bx + cos_t * nx
    hy = sin_t * cp * ty + sin_t * sp * by + cos_t * ny
    hz = sin_t * cp * tz + sin_t * sp * bz + cos_t * nz
    return _normalize3(hx, hy, hz)


def _cosine_sample(u1, u2, nx, ny, nz):
    """Concentric-disk cosine hemisphere (matches shade.sampling)."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    x_major = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(x_major, ox, oy)
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    quarter_pi = jnp.float32(np.pi / 4.0)
    half_pi = jnp.float32(np.pi / 2.0)
    theta = jnp.where(x_major, quarter_pi * (oy / safe_ox),
                      half_pi - quarter_pi * (ox / safe_oy))
    r = jnp.where((ox == 0.0) & (oy == 0.0), 0.0, r)
    dx = r * jnp.cos(theta)
    dy = r * jnp.sin(theta)
    dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    (tx, ty, tz), (bx, by, bz) = _onb(nx, ny, nz)
    wx = dx * tx + dy * bx + dz * nx
    wy = dx * ty + dy * by + dz * ny
    wz = dx * tz + dy * bz + dz * nz
    return _normalize3(wx, wy, wz)


# ---------------------------------------------------------------------------
# Scene packing (host side)
# ---------------------------------------------------------------------------

MAT_COLS = 16  # kind, base3, emission3, metallic, ior, kr3, roughness, pad3


def pack_materials(mt) -> jnp.ndarray:
    """MaterialTable → [K, 16] f32 SMEM plane."""
    k = mt.kind.shape[0]
    out = jnp.zeros((k, MAT_COLS), jnp.float32)
    out = out.at[:, 0].set(mt.kind.astype(jnp.float32))
    out = out.at[:, 1:4].set(mt.base_color)
    out = out.at[:, 4:7].set(mt.emission)
    out = out.at[:, 7].set(mt.metallic)
    out = out.at[:, 8].set(mt.ior)
    out = out.at[:, 9:12].set(mt.kr)
    out = out.at[:, 12].set(mt.roughness)
    return out


def pack_prims(prims) -> jnp.ndarray:
    """CustomPrims → [max(P,1), 16] f32 SMEM plane: params[0:12] + mat_id.

    Column meaning is per-kind (make_prims layout): sphere c3 r; shell
    c3 r_in r_out; parallelogram anchor3 v1_3 v2_3; capsule pa3 pb3 r.
    """
    p = max(prims.num, 1)
    out = jnp.zeros((p, 16), jnp.float32)
    if prims.num:
        out = out.at[:prims.num, 0:12].set(prims.params[:, 0:12])
        out = out.at[:prims.num, 12].set(prims.mat_id.astype(jnp.float32))
    return out


FUSED_PRIM_KINDS = (0, 1, 2, 3)     # sphere, shell, parallelogram, capsule
MAX_FUSED_PRIMS = 16
# Instanced fused path: total per-ray triangle tests = sum of instance
# ranges; cap at the same SMEM budget that gates the flat path.
MAX_FUSED_INST = 32


def pack_instances(instances) -> jnp.ndarray:
    """InstanceTable → [max(I,1), 16] f32 SMEM plane: world→object 3x4
    inverse flattened row-major in cols 0:12 + sbt_offset in col 12+...13."""
    i = max(instances.num, 1)
    out = jnp.zeros((i, 16), jnp.float32)
    if instances.num:
        out = out.at[:instances.num, 0:12].set(
            instances.inv_transform.reshape(instances.num, 12))
        out = out.at[:instances.num, 12].set(
            instances.sbt_offset.astype(jnp.float32))
    return out


def fused_inst_ranges(scene) -> tuple:
    """Static per-instance (lo, hi) triangle ranges for the fused kernel
    (whole shared geometry when the table carries no explicit ranges)."""
    if not scene.has_instances:
        return ()
    return (scene.instances.prim_ranges
            or ((0, scene.geom.num_triangles),) * scene.instances.num)


def pack_light(light) -> jnp.ndarray:
    """ParallelogramLight → [1, 16] f32: corner3 v1_3 v2_3 normal3 emission3 area."""
    return jnp.concatenate([
        light.corner, light.v1, light.v2, light.normal, light.emission,
        jnp.reshape(light.area, (1,)),
    ]).reshape(1, 16).astype(jnp.float32)


def pack_camera(cam_params, miss_color, pixel_spread=0.0) -> jnp.ndarray:
    """Camera dict → [2, 16] f32. Row1 col5 carries the per-pixel ray-cone
    spread (engine.render_sample's pixel_spread) for in-kernel mip LOD."""
    row0 = jnp.concatenate([
        cam_params["eye"], cam_params["U"], cam_params["V"], cam_params["W"],
        cam_params["aperture"][None], cam_params["focal_distance"][None],
        cam_params["ortho"].astype(jnp.float32)[None],
        jnp.zeros((1,), jnp.float32)])
    row1 = jnp.concatenate([
        cam_params["ortho_half"], jnp.asarray(miss_color, jnp.float32),
        jnp.reshape(jnp.asarray(pixel_spread, jnp.float32), (1,)),
        jnp.zeros((10,), jnp.float32)])
    return jnp.stack([row0, row1]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# In-kernel texture machinery (the TPU texture unit): the material BUNDLE
# mip pyramid is packed into ONE row-major table whose rows are (bundle,
# level, y) scanlines — a bilinear tap column pair lives at cols
# [x*16 : x*16+16] of rows base(b,l)+y / +y+1 (the +1 border row/col from
# pack_bundles means taps never wrap). The kernel fetches by folding the
# whole trilinear filter into TWO sparse weight matrices (4 nonzeros per
# lane each) and contracting them with the table on the MXU — the TPU
# replacement for `cudaTextureObject_t` hardware filtering
# (`SDK/cuda/whitted.cu:160-168`; filtering precision is bf16, i.e. finer
# than the 8-bit fixed-point weights of GPU texture units).
# ---------------------------------------------------------------------------

TEX_MAX_TRIS = 64          # static-unroll budget of the winner-attribute
                           # selects; larger textured meshes run the XLA
                           # engine (and real meshes go the cluster path)
TEX_MAX_TABLE_BYTES = 8 * 2 ** 20   # bf16 table VMEM budget
# Filtering precision: bf16 taps/weights ride the MXU fast path (finer
# than GPU texture units' 8-bit fixed-point weights); ORT_TEX_F32=1
# switches the whole filter to f32 for exactness checks (≈4x slower).
# Read per trace so tests can flip it; the table operand's dtype change
# forces the retrace.
def _tex_dtype():
    return (jnp.float32 if os.environ.get("ORT_TEX_F32", "0") != "0"
            else jnp.bfloat16)


def tex_layout(bundle_meta):
    """Static table geometry from DeviceScene.bundle_meta: per (bundle,
    level) row bases into the packed table, padded column/row counts."""
    bases = []
    r = 0
    for levels in bundle_meta:
        lb = []
        for (h, w) in levels:
            lb.append(r)
            r += h + 1
        bases.append(tuple(lb))
    cols = max((w + 1) * 16 for levels in bundle_meta for (h, w) in levels)
    cols = -(-cols // LANES) * LANES
    r_pad = -(-r // LANES) * LANES
    return tuple(bases), r_pad, cols


def pack_tex_table(scene) -> jnp.ndarray:
    """bundles atlas → transposed kernel table [C, R_pad] bf16 (rows of the
    logical table are (b, level, y) scanlines of (w+1)*16 channel-
    interleaved texels; transposed so the kernel's per-128-lane fetch
    matmul contracts table rows against lane weight columns)."""
    meta = scene.bundle_meta
    bases, r_pad, cols = tex_layout(meta)
    max_w = max(m[0][1] for m in meta) + 1
    rows = []
    for b, levels in enumerate(meta):
        y = 0
        for li, (h, w) in enumerate(levels):
            if li == 0:
                yo, xo = 0, 0
            else:
                yo, xo = y, max_w
                y += h + 1
            win = scene.bundles[b, yo:yo + h + 1, xo:xo + w + 1, :]
            row = win.reshape(h + 1, (w + 1) * 16)
            rows.append(jnp.pad(row, ((0, 0), (0, cols - row.shape[1]))))
    tbl = jnp.concatenate(rows, axis=0)
    tbl = jnp.pad(tbl, ((0, r_pad - tbl.shape[0]), (0, 0)))
    return tbl.T.astype(_tex_dtype())


def tex_static(scene) -> tuple:
    """Hashable static config the kernel specializes on: (bases, r_pad,
    cols, per-bundle (dim0, chain), per-material (bundle, has_base,
    has_nm, has_mr, has_em))."""
    meta = scene.bundle_meta
    if not meta or not scene.mat_tex_flags:
        return None
    bases, r_pad, cols = tex_layout(meta)
    hw = tuple(tuple(lv) for lv in meta)
    binfo = tuple((float(max(m[0][0], m[0][1])), len(m)) for m in meta)
    return (bases, hw, r_pad, cols, binfo, tuple(scene.mat_tex_flags))


def pack_shade2(scene) -> jnp.ndarray:
    """Per-triangle shading-attribute SMEM plane [M, 32] for the fused
    kernel's winner selects: uv0(0:2) duv1(2:4) duv2(4:6) uv_density(6)
    tangent(7:10) corner n0(10:13) n1-n0(13:16) n2-n0(16:19) — the
    shade_plane data (accel/geometry.py) in delta form so interpolation
    is 2 FMAs per component."""
    g = scene.geom
    m = max(g.num_triangles, 1)
    out = jnp.zeros((m, 32), jnp.float32)
    if g.num_triangles:
        cuv = g.corner_uv
        cn = g.corner_normal
        out = out.at[:, 0:2].set(cuv[:, 0])
        out = out.at[:, 2:4].set(cuv[:, 1] - cuv[:, 0])
        out = out.at[:, 4:6].set(cuv[:, 2] - cuv[:, 0])
        out = out.at[:, 6].set(g.uv_density)
        out = out.at[:, 7:10].set(g.tangent)
        out = out.at[:, 10:13].set(cn[:, 0])
        out = out.at[:, 13:16].set(cn[:, 1] - cn[:, 0])
        out = out.at[:, 16:19].set(cn[:, 2] - cn[:, 0])
    return out


# ---------------------------------------------------------------------------
# The megakernel
# ---------------------------------------------------------------------------

def _make_kernel(width, height, full_w, full_h,
                 num_tris, num_mats, max_depth, spl, has_specular=True,
                 has_pbr=False, prim_kinds=(), inst_ranges=(),
                 regen=False, tex_cfg=None, smooth=False):
    """has_specular=False (no glass/mirror materials in the scene — a static
    scene feature) drops the reflect/refract/fresnel block from the bounce,
    ~10% fewer VPU ops on diffuse-only scenes like the Cornell benchmark.
    has_pbr adds the rough metallic-roughness lanes: full GGX BRDF toward
    the light in NEE plus the one-sample cosine+GGX MIS bounce — the same
    estimator (and the same RNG draw order) as the XLA engine.
    prim_kinds: static tuple of custom-prim kinds (sphere/shell/
    parallelogram/capsule); per-prim analytic intersectors are emitted
    inline in both the closest-hit and shadow loops — the whitted-class
    custom-geometry IS programs (`cuda/geometry.cu:38-143`, `sphere.cu:37`)
    folded into the megakernel.
    inst_ranges: static tuple of per-instance (lo, hi) triangle ranges into
    the shared object-space GAS — non-empty switches the closest-hit and
    shadow loops to the two-level form: the ray is transformed into each
    instance's object space by its 3x4 inverse from the inst plane (the
    device transform stack, `optix_device.h:728-868`), that instance's
    range is tested, and the winner's object-space normal goes back to
    world by the inverse-transpose rule — the IAS pipeline of
    `Scene.cpp:1134-1213` kept inside the megakernel."""
    glass_kind, pbr_kind = 2.0, 1.0  # shade.materials GLASS / PBR tags
    want_attrs = bool(tex_cfg) or smooth
    # Winner-attribute strategy: small meshes statically unroll selects
    # over the SMEM plane; past the unroll budget the winner row comes
    # from a one-hot MXU contraction against the transposed VMEM plane
    # (HIGHEST precision: single-term one-hot sums are f32-exact).
    attr_onehot = want_attrs and num_tris > TEX_MAX_TRIS

    def kernel(*refs):
        (tri_ref, prim_ref, inst_ref, mat_tbl_ref, light_ref, cam_ref,
         misc_ref) = refs[:7]
        i = 7
        shade2_ref = texT_ref = facc_s = b16_s = attr_s = None
        if want_attrs:
            shade2_ref = refs[i]
            i += 1
        if tex_cfg:
            texT_ref = refs[i]
            i += 1
        rad_r_out, rad_g_out, rad_b_out, count_out = refs[i:i + 4]
        i += 4
        if tex_cfg or attr_onehot:
            facc_s = refs[i]
            i += 1
        if tex_cfg:
            b16_s = refs[i]
            i += 1
        if attr_onehot:
            attr_s = refs[i]
        pid = pl.program_id(0)
        subframe0 = misc_ref[0, 0]
        y0 = misc_ref[0, 1]
        x0 = misc_ref[0, 2]

        lane = (jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1))
        p = pid * BLOCK_RAYS + lane                      # local flat pixel id
        lx = jax.lax.rem(p, width)
        ly = jax.lax.div(p, width)
        gx = lx + x0
        gy = ly + y0
        pixel_index = gy * full_w + gx          # int32; bit-matches uint32 seed

        # Camera constants (scalars from SMEM)
        eyex, eyey, eyez = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        Ux, Uy, Uz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        Vx, Vy, Vz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        Wx, Wy, Wz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        aperture, focal = cam_ref[0, 12], cam_ref[0, 13]
        is_ortho = cam_ref[0, 14] > 0.0
        ohx, ohy = cam_ref[1, 0], cam_ref[1, 1]
        miss_r, miss_g, miss_b = cam_ref[1, 2], cam_ref[1, 3], cam_ref[1, 4]
        pixel_spread = cam_ref[1, 5]     # ray-cone spread for mip LOD

        lcx, lcy, lcz = light_ref[0, 0], light_ref[0, 1], light_ref[0, 2]
        lv1x, lv1y, lv1z = light_ref[0, 3], light_ref[0, 4], light_ref[0, 5]
        lv2x, lv2y, lv2z = light_ref[0, 6], light_ref[0, 7], light_ref[0, 8]
        lnx, lny, lnz = light_ref[0, 9], light_ref[0, 10], light_ref[0, 11]
        lemr, lemg, lemb = light_ref[0, 12], light_ref[0, 13], light_ref[0, 14]
        larea = light_ref[0, 15]

        ulen = jnp.sqrt(jnp.maximum(Ux * Ux + Uy * Uy + Uz * Uz, 1e-20))
        unx, uny, unz = Ux / ulen, Uy / ulen, Uz / ulen
        vlen = jnp.sqrt(jnp.maximum(Vx * Vx + Vy * Vy + Vz * Vz, 1e-20))
        vnx, vny, vnz = Vx / vlen, Vy / vlen, Vz / vlen
        wlen = jnp.sqrt(jnp.maximum(Wx * Wx + Wy * Wy + Wz * Wz, 1e-20))
        wnx, wny, wnz = Wx / wlen, Wy / wlen, Wz / wlen

        fzero = jnp.zeros(lane.shape, jnp.float32)

        def prim_candidates(p, k, rox, roy, roz, rdx, rdy, rdz):
            """Candidate hit distances of prim p (STATIC kind k): list of
            (tt, ok). Mirrors accel/primitives.py _prim_candidates so the
            fused path bit-matches the XLA merge. Normals are NOT carried
            per candidate — the winner's normal is recomputed once after
            the closest-hit loop (prim_normal), which keeps the emitted
            vector code ~3x smaller."""
            def sphere_cands(cx, cy, cz, r):
                ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
                b = _dot3(ocx, ocy, ocz, rdx, rdy, rdz)
                c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
                disc = b * b - c
                ok = disc > 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                return [(-b - sq, ok), (-b + sq, ok)]

            if k == 0:          # SPHERE
                cx, cy, cz = prim_ref[p, 0], prim_ref[p, 1], prim_ref[p, 2]
                return sphere_cands(cx, cy, cz, prim_ref[p, 3])
            if k == 1:          # SPHERE_SHELL (outer + inner surfaces)
                cx, cy, cz = prim_ref[p, 0], prim_ref[p, 1], prim_ref[p, 2]
                return (sphere_cands(cx, cy, cz, prim_ref[p, 4])
                        + sphere_cands(cx, cy, cz, prim_ref[p, 3]))
            if k == 2:          # PARALLELOGRAM
                ax_, ay_, az_ = (prim_ref[p, 0], prim_ref[p, 1],
                                 prim_ref[p, 2])
                v1x, v1y, v1z = (prim_ref[p, 3], prim_ref[p, 4],
                                 prim_ref[p, 5])
                v2x, v2y, v2z = (prim_ref[p, 6], prim_ref[p, 7],
                                 prim_ref[p, 8])
                nx_ = v1y * v2z - v1z * v2y            # scalar cross
                ny_ = v1z * v2x - v1x * v2z
                nz_ = v1x * v2y - v1y * v2x
                nl = jnp.sqrt(jnp.maximum(
                    nx_ * nx_ + ny_ * ny_ + nz_ * nz_, 1e-20))
                nx_, ny_, nz_ = nx_ / nl, ny_ / nl, nz_ / nl
                denom = nx_ * rdx + ny_ * rdy + nz_ * rdz
                safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
                tt = ((ax_ - rox) * nx_ + (ay_ - roy) * ny_
                      + (az_ - roz) * nz_) / safe
                relx = rox + tt * rdx - ax_
                rely = roy + tt * rdy - ay_
                relz = roz + tt * rdz - az_
                v1l2 = jnp.maximum(v1x * v1x + v1y * v1y + v1z * v1z, 1e-20)
                v2l2 = jnp.maximum(v2x * v2x + v2y * v2y + v2z * v2z, 1e-20)
                a1 = _dot3(relx, rely, relz, v1x, v1y, v1z) / v1l2
                a2 = _dot3(relx, rely, relz, v2x, v2y, v2z) / v2l2
                ok = ((jnp.abs(denom) >= 1e-12)
                      & (a1 >= 0.0) & (a1 <= 1.0)
                      & (a2 >= 0.0) & (a2 <= 1.0))
                return [(tt, ok)]
            if k == 3:          # CAPSULE
                pax, pay, paz = (prim_ref[p, 0], prim_ref[p, 1],
                                 prim_ref[p, 2])
                pbx, pby, pbz = (prim_ref[p, 3], prim_ref[p, 4],
                                 prim_ref[p, 5])
                r = prim_ref[p, 6]
                bax, bay, baz = pbx - pax, pby - pay, pbz - paz
                baba = jnp.maximum(
                    bax * bax + bay * bay + baz * baz, 1e-12)
                oax, oay, oaz = rox - pax, roy - pay, roz - paz
                bard = bax * rdx + bay * rdy + baz * rdz
                baoa = _dot3(bax, bay, baz, oax, oay, oaz)
                rdoa = _dot3(rdx, rdy, rdz, oax, oay, oaz)
                oaoa = _dot3(oax, oay, oaz, oax, oay, oaz)
                a_c = baba - bard * bard
                b_c = baba * rdoa - baoa * bard
                c_c = baba * oaoa - baoa * baoa - r * r * baba
                h_c = b_c * b_c - a_c * c_c
                safe_a = jnp.where(jnp.abs(a_c) < 1e-12, 1e-12, a_c)
                t_body = (-b_c - jnp.sqrt(jnp.maximum(h_c, 0.0))) / safe_a
                y_c = baoa + t_body * bard
                body_ok = (h_c > 0.0) & (y_c > 0.0) & (y_c < baba)
                out = [(t_body, body_ok)]
                for qx, qy, qz in ((pax, pay, paz), (pbx, pby, pbz)):
                    ocx, ocy, ocz = rox - qx, roy - qy, roz - qz
                    b = _dot3(ocx, ocy, ocz, rdx, rdy, rdz)
                    c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
                    disc = b * b - c
                    okc = disc > 0.0
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    for tt in (-b - sq, -b + sq):
                        hx = rox + tt * rdx
                        hy = roy + tt * rdy
                        hz = roz + tt * rdz
                        yy = ((hx - pax) * bax + (hy - pay) * bay
                              + (hz - paz) * baz)
                        ok = okc & ((yy <= 0.0) | (yy >= baba))
                        out.append((tt, ok))
                return out
            raise ValueError(f"fused kernel: unsupported prim kind {k}")

        def prim_normal(p, k, hx, hy, hz):
            """Outward normal of prim p (static kind k) at hit point h —
            the same per-kind formulas as accel/primitives.py evaluates at
            its chosen t (shell picks the nearer surface by radius)."""
            if k in (0, 1):     # SPHERE / SPHERE_SHELL
                cx, cy, cz = prim_ref[p, 0], prim_ref[p, 1], prim_ref[p, 2]
                rx, ry, rz = hx - cx, hy - cy, hz - cz
                rad = jnp.sqrt(jnp.maximum(
                    _dot3(rx, ry, rz, rx, ry, rz), 1e-20))
                inv = 1.0 / rad
                if k == 1:
                    r_in, r_out = prim_ref[p, 3], prim_ref[p, 4]
                    is_inner = (jnp.abs(rad - r_in)
                                < jnp.abs(rad - r_out))
                    inv = jnp.where(is_inner, -inv, inv)
                return rx * inv, ry * inv, rz * inv
            if k == 2:          # PARALLELOGRAM
                v1x, v1y, v1z = (prim_ref[p, 3], prim_ref[p, 4],
                                 prim_ref[p, 5])
                v2x, v2y, v2z = (prim_ref[p, 6], prim_ref[p, 7],
                                 prim_ref[p, 8])
                nx_ = v1y * v2z - v1z * v2y
                ny_ = v1z * v2x - v1x * v2z
                nz_ = v1x * v2y - v1y * v2x
                nl = jnp.sqrt(jnp.maximum(
                    nx_ * nx_ + ny_ * ny_ + nz_ * nz_, 1e-20))
                one = jnp.full(lane.shape, 1.0, jnp.float32)
                return one * (nx_ / nl), one * (ny_ / nl), one * (nz_ / nl)
            # CAPSULE: normal from the clamped nearest axis point
            pax, pay, paz = prim_ref[p, 0], prim_ref[p, 1], prim_ref[p, 2]
            pbx, pby, pbz = prim_ref[p, 3], prim_ref[p, 4], prim_ref[p, 5]
            r = prim_ref[p, 6]
            bax, bay, baz = pbx - pax, pby - pay, pbz - paz
            baba = jnp.maximum(bax * bax + bay * bay + baz * baz, 1e-12)
            yh = jnp.clip(((hx - pax) * bax + (hy - pay) * bay
                           + (hz - paz) * baz) / baba, 0.0, 1.0)
            inv_r = 1.0 / jnp.maximum(r, 1e-12)
            return ((hx - (pax + yh * bax)) * inv_r,
                    (hy - (pay + yh * bay)) * inv_r,
                    (hz - (paz + yh * baz)) * inv_r)

        def raygen_state(sv, count):
            """Fresh path state for per-lane sample indices `sv` (engine
            raygen parity; the RNG stream is a pure function of
            (pixel, subframe0+sv), so lanes at different sample indices
            stay bit-identical to the lock-step engine)."""
            rng = _tea(pixel_index, subframe0 + sv)

            # --- raygen (camera.generate_rays parity) ---
            jx, jy, rng = _uniform2(rng)
            ndc_x = 2.0 * ((gx.astype(jnp.float32) + jx) / full_w) - 1.0
            ndc_y = 1.0 - 2.0 * ((gy.astype(jnp.float32) + jy) / full_h)

            dx = ndc_x * Ux + ndc_y * Vx + Wx
            dy = ndc_x * Uy + ndc_y * Vy + Wy
            dz = ndc_x * Uz + ndc_y * Vz + Wz
            dx, dy, dz = _normalize3(dx, dy, dz)
            ox = jnp.full(lane.shape, eyex, jnp.float32)
            oy = jnp.full(lane.shape, eyey, jnp.float32)
            oz = jnp.full(lane.shape, eyez, jnp.float32)

            # orthographic select
            oox = eyex + ndc_x * ohx * unx + ndc_y * ohy * vnx
            ooy = eyey + ndc_x * ohx * uny + ndc_y * ohy * vny
            ooz = eyez + ndc_x * ohx * unz + ndc_y * ohy * vnz
            ox = jnp.where(is_ortho, oox, ox)
            oy = jnp.where(is_ortho, ooy, oy)
            oz = jnp.where(is_ortho, ooz, oz)
            dx = jnp.where(is_ortho, wnx, dx)
            dy = jnp.where(is_ortho, wny, dy)
            dz = jnp.where(is_ortho, wnz, dz)

            # thin-lens DoF (consumes 2 draws, applied when aperture > 0)
            u1, u2, rng = _uniform2(rng)
            r_l = jnp.sqrt(u1) * aperture
            phi_l = jnp.float32(_TWO_PI) * u2
            lensx = r_l * jnp.cos(phi_l) * unx + r_l * jnp.sin(phi_l) * vnx
            lensy = r_l * jnp.cos(phi_l) * uny + r_l * jnp.sin(phi_l) * vny
            lensz = r_l * jnp.cos(phi_l) * unz + r_l * jnp.sin(phi_l) * vnz
            fx = ox + focal * dx
            fy = oy + focal * dy
            fz = oz + focal * dz
            dofox, dofoy, dofoz = ox + lensx, oy + lensy, oz + lensz
            ddx, ddy, ddz = _normalize3(fx - dofox, fy - dofoy, fz - dofoz)
            use_dof = aperture > 0.0
            ox = jnp.where(use_dof, dofox, ox)
            oy = jnp.where(use_dof, dofoy, oy)
            oz = jnp.where(use_dof, dofoz, oz)
            dx = jnp.where(use_dof, ddx, dx)
            dy = jnp.where(use_dof, ddy, dy)
            dz = jnp.where(use_dof, ddz, dz)

            # --- path state ---
            return (ox, oy, oz, dx, dy, dz,
                    jnp.full(lane.shape, 1.0, jnp.float32),  # throughput rgb
                    jnp.full(lane.shape, 1.0, jnp.float32),
                    jnp.full(lane.shape, 1.0, jnp.float32),
                    fzero, fzero, fzero,                      # radiance rgb
                    rng,
                    jnp.ones(lane.shape, jnp.int32),          # active
                    jnp.ones(lane.shape, jnp.int32),          # prev_specular
                    count,
                    jnp.full(lane.shape, RAY_TMIN * 1e-2, jnp.float32),
                    jnp.full(lane.shape, 1e16, jnp.float32)   # tmin/tmax
                    ) + ((fzero,) if tex_cfg else ())         # path_len

        def inst_xform_ray(i, rox, roy, roz, rdx, rdy, rdz):
            """World ray → instance i's object space (3x4 inverse from
            the SMEM inst plane). Direction stays UNNORMALIZED so the
            object-space t equals the world-space t."""
            c = [inst_ref[i, j] for j in range(12)]
            return ((c[0] * rox + c[1] * roy + c[2] * roz + c[3],
                     c[4] * rox + c[5] * roy + c[6] * roz + c[7],
                     c[8] * rox + c[9] * roy + c[10] * roz + c[11]),
                    (c[0] * rdx + c[1] * rdy + c[2] * rdz,
                     c[4] * rdx + c[5] * rdy + c[6] * rdz,
                     c[8] * rdx + c[9] * rdy + c[10] * rdz))

        def fetch_bundle16(uvx, uvy, b_lane, tscale, valid):
            """In-kernel trilinear material-bundle fetch: per mip pass, the
            bilinear row taps x trilinear level weight fold into a sparse
            weight matrix contracted with the bf16 mip table on the MXU;
            the column (x) taps fold on the VPU. All per-lane math (LOD,
            level constants, taps, weights) runs once on the full
            (SUBLANES, LANES) tile; only the matmul stage iterates per
            128-lane sublane group, with loop bounds from that group's
            valid-lane footprint — coherent primaries touch a few tiles of
            the finest level while scattered bounce lanes stay cheap
            because their ray cones select coarse mips. Fills b16_s
            [16, SUBLANES, LANES] with sample_bundle's channels."""
            bases, hw, r_pad, cols, binfo, _mf = tex_cfg
            b16_s[...] = jnp.zeros((16, SUBLANES, LANES), jnp.float32)
            big = jnp.int32(1 << 30)
            vaf_t = valid.astype(jnp.float32)
            u_t = jnp.where(valid, uvx, 0.0)
            v_t = jnp.where(valid, uvy, 0.0)
            ts_t = jnp.where(valid, tscale, 0.0)
            bsafe = jnp.maximum(b_lane, 0)
            dim0 = jnp.ones(lane.shape, jnp.float32)
            chain = jnp.ones(lane.shape, jnp.float32)
            for bi, (d0, cl) in enumerate(binfo):
                selb = bsafe == bi
                dim0 = jnp.where(selb, jnp.float32(d0), dim0)
                chain = jnp.where(selb, jnp.float32(cl), chain)
            # ray-cone LOD (engine sample_bundle parity)
            lod = jnp.log2(jnp.maximum(ts_t * dim0, 1.0))
            lod = jnp.clip(lod, 0.0, chain - 1.0)
            l0f = jnp.floor(lod)
            f = lod - l0f
            l1f = jnp.minimum(l0f + 1.0, chain - 1.0)
            for lv, lw in ((l0f.astype(jnp.int32), 1.0 - f),
                           (l1f.astype(jnp.int32), f)):
                base = jnp.zeros(lane.shape, jnp.int32)
                hh = jnp.ones(lane.shape, jnp.float32)
                ww = jnp.ones(lane.shape, jnp.float32)
                for bi, levels in enumerate(hw):
                    for li in range(len(levels)):
                        sel = (bsafe == bi) & (lv == li)
                        base = jnp.where(sel, jnp.int32(bases[bi][li]),
                                         base)
                        hh = jnp.where(sel, jnp.float32(levels[li][0]), hh)
                        ww = jnp.where(sel, jnp.float32(levels[li][1]), ww)
                # wrap addressing, texel centers at +0.5 (texture.py)
                uu = u_t - jnp.floor(u_t)
                vv = v_t - jnp.floor(v_t)
                x = uu * ww - 0.5
                y = vv * hh - 0.5
                x0f = jnp.floor(x)
                y0f = jnp.floor(y)
                fx_t = x - x0f
                fy = y - y0f
                # base-corner wrap; the +1 border row/col covers the far
                # taps without wrapping
                xi_t = (x0f + jnp.where(x0f < 0.0, ww, 0.0)
                        ).astype(jnp.int32)
                yi = (y0f + jnp.where(y0f < 0.0, hh, 0.0)).astype(jnp.int32)
                row0_t = base + yi
                row1_t = row0_t + 1
                wy0_t = (1.0 - fy) * lw * vaf_t
                wy1_t = fy * lw * vaf_t
                rcs_t = jnp.where(valid, row0_t >> 7, big)
                rce_t = jnp.where(valid, row1_t >> 7, -1)
                xss_t = jnp.where(valid, xi_t >> 3, big)
                xse_t = jnp.where(valid, (xi_t + 1) >> 3, -1)

                for g in range(SUBLANES):
                    row0 = row0_t[g:g + 1, :]
                    row1 = row1_t[g:g + 1, :]
                    wy0 = wy0_t[g:g + 1, :]
                    wy1 = wy1_t[g:g + 1, :]
                    xi = xi_t[g:g + 1, :]
                    fx = fx_t[g:g + 1, :]
                    rc0 = jnp.min(rcs_t[g:g + 1, :])
                    rc1 = jnp.max(rce_t[g:g + 1, :])
                    xs0 = jnp.min(xss_t[g:g + 1, :])
                    xs1 = jnp.max(xse_t[g:g + 1, :])

                    def xseg_body(xs, c_, row0=row0, row1=row1, wy0=wy0,
                                  wy1=wy1, xi=xi, fx=fx, rc0=rc0, rc1=rc1,
                                  g=g):
                        facc_s[...] = jnp.zeros((LANES, LANES), jnp.float32)

                        def rc_body(rc, c2_):
                            rid = (jax.lax.broadcasted_iota(
                                jnp.int32, (LANES, LANES), 0) + rc * LANES)
                            wt = ((rid == row0) * wy0 + (rid == row1) * wy1)
                            tb = texT_ref[pl.ds(xs * LANES, LANES),
                                          pl.ds(rc * LANES, LANES)]
                            facc_s[...] += jax.lax.dot_general(
                                tb, wt.astype(_tex_dtype()),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            return c2_

                        jax.lax.fori_loop(rc0, rc1 + 1, rc_body, 0)
                        jloc = jax.lax.broadcasted_iota(
                            jnp.int32, (LANES, LANES), 0) >> 4
                        x_here = xs * 8 + jloc
                        xw = ((x_here == xi) * (1.0 - fx)
                              + (x_here == xi + 1) * fx)
                        prod = facc_s[...] * xw
                        # fold the 8 texel groups: strided slice-adds (a
                        # (8,16,128) reshape-reduce is the same cost but
                        # a riskier Mosaic relayout)
                        part = prod[0:16, :]
                        for j in range(1, 8):
                            part = part + prod[j * 16:(j + 1) * 16, :]
                        b16_s[:, g, :] += part
                        return c_

                    jax.lax.fori_loop(xs0, xs1 + 1, xseg_body, 0)

        def bounce(depth, st):
            if tex_cfg:
                (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr_, rg_, rb_, rng,
                 active, prev_spec, count, tmin, tmax, path_len) = st
            else:
                (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr_, rg_, rb_, rng,
                 active, prev_spec, count, tmin, tmax) = st
                path_len = None

            # --- closest hit over SMEM triangles ---
            neg1 = jnp.full(lane.shape, -1, jnp.int32)

            def tri_body_rays(rox, roy, roz, rdx, rdy, rdz,
                              sbt_off=None, inst_i=None):
                def tri_body(t, carry):
                    (bt, bid, bmid, bnx, bny, bnz, binst,
                     buu, bvv) = carry
                    consts = _load_tri(tri_ref, t)
                    tt, uu, vv, dpz = _tri_test(consts, rox, roy, roz,
                                                rdx, rdy, rdz)
                    ok = ((jnp.abs(dpz) > _DEGEN_EPS)
                          & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (tt > tmin) & (tt < bt))
                    mid = tri_ref[t, 15]
                    if sbt_off is not None:
                        mid = mid + sbt_off
                    bt = jnp.where(ok, tt, bt)
                    bid = jnp.where(ok, t, bid)
                    bmid = jnp.where(ok, mid.astype(jnp.int32), bmid)
                    bnx = jnp.where(ok, consts[12], bnx)
                    bny = jnp.where(ok, consts[13], bny)
                    bnz = jnp.where(ok, consts[14], bnz)
                    if inst_i is not None:
                        binst = jnp.where(ok, inst_i, binst)
                    if want_attrs:
                        # winner barycentrics for uv/normal interpolation
                        buu = jnp.where(ok, uu, buu)
                        bvv = jnp.where(ok, vv, bvv)
                    return bt, bid, bmid, bnx, bny, bnz, binst, buu, bvv
                return tri_body

            init = (tmax, neg1, neg1, fzero, fzero, fzero, neg1,
                    fzero, fzero)
            if inst_ranges:
                carry = init
                for i, (lo, hi) in enumerate(inst_ranges):
                    (rox, roy, roz), (rdx, rdy, rdz) = inst_xform_ray(
                        i, ox, oy, oz, dx, dy, dz)
                    body = tri_body_rays(rox, roy, roz, rdx, rdy, rdz,
                                         sbt_off=inst_ref[i, 12],
                                         inst_i=i)
                    if hi - lo <= 64:
                        for t in range(lo, hi):
                            carry = body(t, carry)
                    else:
                        carry = jax.lax.fori_loop(lo, hi, body, carry)
                (bt, bid, bmid, gnx, gny, gnz, binst, buu, bvv) = carry
                # winner's OBJECT-space normal back to world by the
                # inverse-transpose row rule w_k = sum_j n_j inv[j][k]
                # (matches tlas.intersect_instances), then normalize.
                for i in range(len(inst_ranges)):
                    c = [inst_ref[i, j] for j in range(12)]
                    sel = binst == i
                    wx = gnx * c[0] + gny * c[4] + gnz * c[8]
                    wy = gnx * c[1] + gny * c[5] + gnz * c[9]
                    wz = gnx * c[2] + gny * c[6] + gnz * c[10]
                    gnx = jnp.where(sel, wx, gnx)
                    gny = jnp.where(sel, wy, gny)
                    gnz = jnp.where(sel, wz, gnz)
                gnx, gny, gnz = _normalize3(gnx, gny, gnz)
            # Static unroll for small meshes: removes scf loop control
            # and lets Mosaic pipeline SMEM scalar loads with vector
            # work.
            elif num_tris <= 64:
                carry = init
                body = tri_body_rays(ox, oy, oz, dx, dy, dz)
                for t in range(num_tris):
                    carry = body(t, carry)
                (bt, bid, bmid, gnx, gny, gnz, _, buu, bvv) = carry
            else:
                (bt, bid, bmid, gnx, gny, gnz, _,
                 buu, bvv) = jax.lax.fori_loop(
                    0, num_tris, tri_body_rays(ox, oy, oz, dx, dy, dz),
                    init)

            # --- custom prims (static per-kind intersectors) ---
            for p_i, k_i in enumerate(prim_kinds):
                cands = prim_candidates(p_i, k_i, ox, oy, oz,
                                        dx, dy, dz)
                pmid = prim_ref[p_i, 12].astype(jnp.int32)
                for tt, okg in cands:
                    ok = okg & (tt > tmin) & (tt < bt)
                    bt = jnp.where(ok, tt, bt)
                    bid = jnp.where(ok, num_tris + p_i, bid)
                    bmid = jnp.where(ok, pmid, bmid)
            if prim_kinds:
                # winner-only normal recomputation at the hit point
                phx = ox + bt * dx
                phy = oy + bt * dy
                phz = oz + bt * dz
                for p_i, k_i in enumerate(prim_kinds):
                    pnx, pny, pnz = prim_normal(p_i, k_i, phx, phy, phz)
                    sel = bid == num_tris + p_i
                    gnx = jnp.where(sel, pnx, gnx)
                    gny = jnp.where(sel, pny, gny)
                    gnz = jnp.where(sel, pnz, gnz)

            hit = bid >= 0
            hit_valid = hit & (active > 0)

            # miss: constant background
            miss_take = ((active > 0) & ~hit).astype(jnp.float32)
            rr_ = rr_ + miss_take * tr * miss_r
            rg_ = rg_ + miss_take * tg * miss_g
            rb_ = rb_ + miss_take * tb * miss_b

            # --- material fetch (K-way select from SMEM) ---
            kind = fzero
            alb_r = fzero
            alb_g = fzero
            alb_b = fzero
            em_r = fzero
            em_g = fzero
            em_b = fzero
            metallic = fzero
            rough = fzero
            ior = jnp.full(lane.shape, 1.5, jnp.float32)
            kr_r = fzero
            kr_g = fzero
            kr_b = fzero
            for k in range(num_mats):
                sel = bmid == k
                kind = jnp.where(sel, mat_tbl_ref[k, 0], kind)
                alb_r = jnp.where(sel, mat_tbl_ref[k, 1], alb_r)
                alb_g = jnp.where(sel, mat_tbl_ref[k, 2], alb_g)
                alb_b = jnp.where(sel, mat_tbl_ref[k, 3], alb_b)
                em_r = jnp.where(sel, mat_tbl_ref[k, 4], em_r)
                em_g = jnp.where(sel, mat_tbl_ref[k, 5], em_g)
                em_b = jnp.where(sel, mat_tbl_ref[k, 6], em_b)
                if has_specular or has_pbr:
                    metallic = jnp.where(sel, mat_tbl_ref[k, 7], metallic)
                    rough = jnp.where(sel, mat_tbl_ref[k, 12], rough)
                if has_specular:
                    ior = jnp.where(sel, mat_tbl_ref[k, 8], ior)
                    kr_r = jnp.where(sel, mat_tbl_ref[k, 9], kr_r)
                    kr_g = jnp.where(sel, mat_tbl_ref[k, 10], kr_g)
                    kr_b = jnp.where(sel, mat_tbl_ref[k, 11], kr_b)

            if want_attrs:
                # --- winner per-triangle shading attributes (engine
                # shading_frame parity) ---
                is_tri = hit & (bid < num_tris)
                a_cols = list(range(0, 10)) if tex_cfg else []
                if smooth:
                    a_cols += list(range(10, 19))
                if not attr_onehot:
                    # static-unrolled selects over the SMEM plane
                    attr = {c: fzero for c in a_cols}
                    for t in range(num_tris):
                        selt = bid == t
                        for c in a_cols:
                            attr[c] = jnp.where(selt, shade2_ref[t, c],
                                                attr[c])
                else:
                    # one-hot MXU winner fetch: per 128-lane group, chunk
                    # the transposed [32→128, M_pad] attribute plane and
                    # contract with (row == winning id) one-hots — bounds
                    # from the group's live id footprint.
                    big_i = jnp.int32(1 << 30)
                    for g in range(SUBLANES):
                        vag = is_tri[g:g + 1, :]
                        bidg = jnp.where(vag, bid[g:g + 1, :], -1)
                        c0 = jnp.min(jnp.where(vag, bidg >> 7, big_i))
                        c1 = jnp.max(bidg >> 7)
                        facc_s[...] = jnp.zeros((LANES, LANES),
                                                jnp.float32)

                        def a_chunk(ck, c_, bidg=bidg):
                            rid = (jax.lax.broadcasted_iota(
                                jnp.int32, (LANES, LANES), 0) + ck * LANES)
                            wt = (rid == bidg).astype(jnp.float32)
                            tb = shade2_ref[:, pl.ds(ck * LANES, LANES)]
                            facc_s[...] += jax.lax.dot_general(
                                tb, wt, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                            return c_

                        jax.lax.fori_loop(c0, c1 + 1, a_chunk, 0)
                        attr_s[:, g, :] = facc_s[0:32, :]
                    attr = {c: attr_s[c] for c in a_cols}
                if smooth:
                    # interpolated vertex normal; degenerate → face normal
                    snx = attr[10] + buu * attr[13] + bvv * attr[16]
                    sny = attr[11] + buu * attr[14] + bvv * attr[17]
                    snz = attr[12] + buu * attr[15] + bvv * attr[18]
                    ln2 = _dot3(snx, sny, snz, snx, sny, snz)
                    ok_n = is_tri & (ln2 > 1e-12)
                    inv = jax.lax.rsqrt(jnp.maximum(ln2, 1e-20))
                    gnx = jnp.where(ok_n, snx * inv, gnx)
                    gny = jnp.where(ok_n, sny * inv, gny)
                    gnz = jnp.where(ok_n, snz * inv, gnz)
            if tex_cfg:
                # --- in-kernel textures (whitted.cu:160-168 sampleTexture
                # folded into the megakernel) ---
                uvx = attr[0] + buu * attr[2] + bvv * attr[4]
                uvy = attr[1] + buu * attr[3] + bvv * attr[5]
                # ray-cone mip LOD: footprint = spread x path length,
                # texels via the triangle's uv density (engine parity)
                cone = pixel_spread * (path_len
                                       + jnp.where(hit_valid, bt, fzero))
                tsc = jnp.where(is_tri, cone * attr[6], 0.0)
                false_l = jnp.zeros(lane.shape, bool)
                b_lane = jnp.full(lane.shape, -1, jnp.int32)
                m_base = m_nm = m_mr = m_em = false_l
                for k, fl in enumerate(tex_cfg[5]):
                    selk = bmid == k
                    if fl[0] >= 0:
                        b_lane = jnp.where(selk, jnp.int32(fl[0]), b_lane)
                    if fl[1]:
                        m_base = m_base | selk
                    if fl[2]:
                        m_nm = m_nm | selk
                    if fl[3]:
                        m_mr = m_mr | selk
                    if fl[4]:
                        m_em = m_em | selk
                f_valid = is_tri & (b_lane >= 0)
                fetch_bundle16(uvx, uvy,
                               jnp.where(f_valid, b_lane, -1), tsc, f_valid)
                ch = [b16_s[c] for c in range(16)]
                ab_m = is_tri & m_base
                alb_r = jnp.where(ab_m, alb_r * ch[0], alb_r)
                alb_g = jnp.where(ab_m, alb_g * ch[1], alb_g)
                alb_b = jnp.where(ab_m, alb_b * ch[2], alb_b)
                mr_m = is_tri & m_mr
                rough = jnp.where(mr_m, rough * ch[10], rough)
                metallic = jnp.where(mr_m, metallic * ch[11], metallic)
                em_m = is_tri & m_em
                em_r = jnp.where(em_m, em_r * ch[7], em_r)
                em_g = jnp.where(em_m, em_g * ch[8], em_g)
                em_b = jnp.where(em_m, em_b * ch[9], em_b)
                nm_m = is_tri & m_nm
                if any(fl[2] for fl in tex_cfg[5]):
                    # tangent-space normal map: TBN from the uv-aligned
                    # tangent Gram-Schmidt'd against the shading normal
                    nmx = ch[4] * 2.0 - 1.0
                    nmy = ch[5] * 2.0 - 1.0
                    nmz = ch[6] * 2.0 - 1.0
                    tdn = _dot3(attr[7], attr[8], attr[9], gnx, gny, gnz)
                    t_x = attr[7] - gnx * tdn
                    t_y = attr[8] - gny * tdn
                    t_z = attr[9] - gnz * tdn
                    tl = jnp.sqrt(jnp.maximum(
                        _dot3(t_x, t_y, t_z, t_x, t_y, t_z), 1e-20))
                    t_x, t_y, t_z = t_x / jnp.maximum(tl, 1e-8), \
                        t_y / jnp.maximum(tl, 1e-8), t_z / jnp.maximum(tl, 1e-8)
                    b_x = gny * t_z - gnz * t_y
                    b_y = gnz * t_x - gnx * t_z
                    b_z = gnx * t_y - gny * t_x
                    mnx, mny, mnz = _normalize3(
                        t_x * nmx + b_x * nmy + gnx * nmz,
                        t_y * nmx + b_y * nmy + gny * nmz,
                        t_z * nmx + b_z * nmy + gnz * nmz)
                    gnx = jnp.where(nm_m, mnx, gnx)
                    gny = jnp.where(nm_m, mny, gny)
                    gnz = jnp.where(nm_m, mnz, gnz)

            # two-sided shading normal
            flip = jnp.where(_dot3(gnx, gny, gnz, dx, dy, dz) > 0.0, -1.0, 1.0)
            nx, ny, nz = gnx * flip, gny * flip, gnz * flip

            px = ox + bt * dx
            py = oy + bt * dy
            pz = oz + bt * dz

            # emission on primary/specular-previous hits
            em_take = (hit_valid & (prev_spec > 0)).astype(jnp.float32)
            rr_ = rr_ + em_take * tr * em_r
            rg_ = rg_ + em_take * tg * em_g
            rb_ = rb_ + em_take * tb * em_b

            if has_specular:
                is_glass = kind == glass_kind
                # Matches engine.py's mirror classification exactly:
                # rough fully-metallic PBR must NOT go down the mirror lane.
                is_mirror = ((kind == pbr_kind) & (metallic > 0.99)
                             & (rough <= 0.05))
                is_specular = is_glass | is_mirror
                is_diffuse = ~is_specular
            else:
                false_lane = jnp.zeros(lane.shape, bool)
                is_glass = is_mirror = is_specular = false_lane
                is_diffuse = ~false_lane
            if has_pbr:
                is_pbr = (kind == pbr_kind) & ~is_mirror
            else:
                is_pbr = jnp.zeros(lane.shape, bool)

            ta_r, ta_g, ta_b = tr * alb_r, tg * alb_g, tb * alb_b

            # --- NEE: sample light, weight, shadow ray over triangles ---
            u1, u2, rng = _uniform2(rng)
            lpx = lcx + u1 * lv1x + u2 * lv2x
            lpy = lcy + u1 * lv1y + u2 * lv2y
            lpz = lcz + u1 * lv1z + u2 * lv2z
            dxl = lpx - px
            dyl = lpy - py
            dzl = lpz - pz
            dist2 = jnp.maximum(_dot3(dxl, dyl, dzl, dxl, dyl, dzl), 1e-12)
            dist = jnp.sqrt(dist2)
            inv_dist = 1.0 / dist
            wix, wiy, wiz = dxl * inv_dist, dyl * inv_dist, dzl * inv_dist
            n_dl = _dot3(nx, ny, nz, wix, wiy, wiz)
            ln_dl = jnp.abs(lnx * wix + lny * wiy + lnz * wiz)

            sh_tmin = jnp.full(lane.shape, RAY_TMIN, jnp.float32)
            sh_tmax = dist * SHADOW_TMAX_SCALE

            def sh_body_rays(sox, soy, soz, sdx, sdy, sdz):
                def sh_body(t, occ):
                    consts = _load_tri(tri_ref, t)
                    tt, uu, vv, dpz = _tri_test(consts, sox, soy, soz,
                                                sdx, sdy, sdz)
                    ok = ((jnp.abs(dpz) > _DEGEN_EPS)
                          & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (tt > sh_tmin) & (tt < sh_tmax))
                    return jnp.maximum(occ, ok.astype(jnp.int32))
                return sh_body

            occ = jnp.zeros(lane.shape, jnp.int32)
            if inst_ranges:
                # Shadow ray through each instance's object space; t
                # stays in world units (unnormalized direction), so
                # the [sh_tmin, sh_tmax) window applies unchanged.
                for i, (lo, hi) in enumerate(inst_ranges):
                    (sox, soy, soz), (sdx, sdy, sdz) = inst_xform_ray(
                        i, px, py, pz, wix, wiy, wiz)
                    body = sh_body_rays(sox, soy, soz, sdx, sdy, sdz)
                    if hi - lo <= 64:
                        for t in range(lo, hi):
                            occ = body(t, occ)
                    else:
                        occ = jax.lax.fori_loop(lo, hi, body, occ)
            elif num_tris <= 64:
                body = sh_body_rays(px, py, pz, wix, wiy, wiz)
                for t in range(num_tris):
                    occ = body(t, occ)
            else:
                occ = jax.lax.fori_loop(
                    0, num_tris, sh_body_rays(px, py, pz, wix, wiy, wiz),
                    occ)
            for p_i, k_i in enumerate(prim_kinds):
                for tt, okg in prim_candidates(p_i, k_i, px, py, pz,
                                                   wix, wiy, wiz):
                    ok = okg & (tt > sh_tmin) & (tt < sh_tmax)
                    occ = jnp.maximum(occ, ok.astype(jnp.int32))
            w_l = jnp.where((n_dl > 0.0) & (occ == 0),
                            n_dl * ln_dl * larea
                            / (jnp.float32(np.pi) * dist2), 0.0)
            nee_take = (hit_valid & is_diffuse
                        & ~is_pbr).astype(jnp.float32) * w_l
            rr_ = rr_ + nee_take * ta_r * lemr
            rg_ = rg_ + nee_take * ta_g * lemg
            rb_ = rb_ + nee_take * ta_b * lemb
            if has_pbr:
                # PBR lanes: full-BRDF NEE, T * f * em * nDl*LnDl*A/d^2
                # (engine.py _nee_direct_light pbr branch).
                nfr, nfg, nfb = _pbr_brdf3(
                    nx, ny, nz, -dx, -dy, -dz, wix, wiy, wiz,
                    alb_r, alb_g, alb_b, metallic, rough)
                w2 = jnp.where((n_dl > 0.0) & (occ == 0),
                               n_dl * ln_dl * larea / dist2, 0.0)
                pbr_take = (hit_valid & is_pbr).astype(jnp.float32) * w2
                rr_ = rr_ + pbr_take * tr * nfr * lemr
                rg_ = rg_ + pbr_take * tg * nfg * lemg
                rb_ = rb_ + pbr_take * tb * nfb * lemb

            # --- next direction ---
            u1, u2, rng = _uniform2(rng)
            cdx, cdy, cdz = _cosine_sample(u1, u2, nx, ny, nz)
            dn = _dot3(dx, dy, dz, nx, ny, nz)

            if has_pbr:
                # One-sample MIS between the cosine and GGX lobes —
                # identical math AND draw order to the XLA engine.
                rclamp = jnp.maximum(rough, 0.05)
                u5p, u6p, rng = _uniform2(rng)
                hvx, hvy, hvz = _ggx_sample_half(u5p, u6p, nx, ny, nz,
                                                 rclamp)
                dh = _dot3(dx, dy, dz, hvx, hvy, hvz)
                ggx, ggy, ggz = _normalize3(dx - 2.0 * dh * hvx,
                                            dy - 2.0 * dh * hvy,
                                            dz - 2.0 * dh * hvz)
                p_spec = jnp.clip(0.5 * metallic + 0.1, 0.05, 0.95)
                u7p, _u8p, rng = _uniform2(rng)
                choose_spec = u7p < p_spec
                pdx = jnp.where(choose_spec, ggx, cdx)
                pdy = jnp.where(choose_spec, ggy, cdy)
                pdz = jnp.where(choose_spec, ggz, cdz)
                pfr, pfg, pfb = _pbr_brdf3(
                    nx, ny, nz, -dx, -dy, -dz, pdx, pdy, pdz,
                    alb_r, alb_g, alb_b, metallic, rclamp)
                ppdf = _pbr_pdf3(nx, ny, nz, -dx, -dy, -dz,
                                 pdx, pdy, pdz, rclamp, p_spec)
                n_dl_p = jnp.maximum(_dot3(nx, ny, nz, pdx, pdy, pdz),
                                     0.0)
                pvalid = (n_dl_p > 1e-5) & (ppdf > 1e-7)
                pscale = jnp.where(pvalid,
                                   n_dl_p / jnp.maximum(ppdf, 1e-7),
                                   0.0)
                ptr = tr * pfr * pscale
                ptg = tg * pfg * pscale
                ptb = tb * pfb * pscale
                ipf = is_pbr
                cdx = jnp.where(ipf, pdx, cdx)
                cdy = jnp.where(ipf, pdy, cdy)
                cdz = jnp.where(ipf, pdz, cdz)

            if has_specular:
                mrx, mry, mrz = _normalize3(dx - 2.0 * dn * nx,
                                            dy - 2.0 * dn * ny,
                                            dz - 2.0 * dn * nz)

                # glass refract/reflect
                entering = _dot3(dx, dy, dz, gnx, gny, gnz) < 0.0
                eta = jnp.where(entering, 1.0 / ior, ior)
                cos_i = jnp.clip(-dn, 0.0, 1.0)
                sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
                refr_ok = sin2_t <= 1.0
                cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
                rfx = eta * dx + (eta * cos_i - cos_t) * nx
                rfy = eta * dy + (eta * cos_i - cos_t) * ny
                rfz = eta * dz + (eta * cos_i - cos_t) * nz
                rfx, rfy, rfz = _normalize3(rfx, rfy, rfz)
                r0 = ((ior - 1.0) / (ior + 1.0)) ** 2
                one_m = 1.0 - cos_i
                fres = r0 + (1.0 - r0) * one_m ** 5
                u3, _u4, rng = _uniform2(rng)
                gl_refl = (~refr_ok) | (u3 < fres)
                gdx = jnp.where(gl_refl, mrx, rfx)
                gdy = jnp.where(gl_refl, mry, rfy)
                gdz = jnp.where(gl_refl, mrz, rfz)

                ndx = jnp.where(is_glass, gdx,
                                jnp.where(is_mirror, mrx, cdx))
                ndy = jnp.where(is_glass, gdy,
                                jnp.where(is_mirror, mry, cdy))
                ndz = jnp.where(is_glass, gdz,
                                jnp.where(is_mirror, mrz, cdz))

                has_kr = (kr_r > 0.0) | (kr_g > 0.0) | (kr_b > 0.0)
                sp_r = jnp.where(has_kr, kr_r, alb_r)
                sp_g = jnp.where(has_kr, kr_g, alb_g)
                sp_b = jnp.where(has_kr, kr_b, alb_b)
                ntr = jnp.where(is_specular, tr * sp_r, ta_r)
                ntg = jnp.where(is_specular, tg * sp_g, ta_g)
                ntb = jnp.where(is_specular, tb * sp_b, ta_b)
            else:
                rng = _advance2(rng)   # keep stream parity (glass draw)
                ndx, ndy, ndz = cdx, cdy, cdz
                ntr, ntg, ntb = ta_r, ta_g, ta_b
            if has_pbr:
                ntr = jnp.where(is_pbr, ptr, ntr)
                ntg = jnp.where(is_pbr, ptg, ntg)
                ntb = jnp.where(is_pbr, ptb, ntb)

            off = jnp.where(_dot3(ndx, ndy, ndz, nx, ny, nz) >= 0.0,
                            1.0, -1.0) * jnp.float32(RAY_TMIN)
            nox = px + nx * off
            noy = py + ny * off
            noz = pz + nz * off

            # Russian roulette from depth >= 1
            u5, _u6, rng = _uniform2(rng)
            q = jnp.clip(jnp.maximum(ntr, jnp.maximum(ntg, ntb)),
                         0.05, 1.0)
            do_rr = depth >= 1
            # No i1-vector selects (Mosaic can't legalize them): express
            # the RR gate as boolean algebra instead of jnp.where.
            survive = ~((u5 >= q) & do_rr)
            inv_q = jnp.where(do_rr, 1.0 / q, 1.0)
            ntr = ntr * inv_q
            ntg = ntg * inv_q
            ntb = ntb * inv_q

            count = (count + (active > 0).astype(jnp.float32)
                     + (hit_valid & is_diffuse).astype(jnp.float32))

            # Forced end at the depth cap: the fori semantics ran exactly
            # max_depth bounces; the regeneration loop ends the path here
            # instead (identical radiance — nothing accumulates after).
            new_active = (hit_valid & survive
                          & (depth < max_depth - 1)).astype(jnp.int32)
            return (nox, noy, noz, ndx, ndy, ndz, ntr, ntg, ntb,
                    rr_, rg_, rb_, rng, new_active,
                    is_specular.astype(jnp.int32), count,
                    jnp.full(lane.shape, RAY_TMIN, jnp.float32),
                    jnp.full(lane.shape, 1e16, jnp.float32)
                    ) + (((path_len + jnp.where(hit_valid, bt, fzero)),)
                         if tex_cfg else ())

        izero = jnp.zeros(lane.shape, jnp.int32)
        if regen:
            # --- path-regeneration loop (persistent paths) ---
            # Lock-step bounce loops waste ~65% of lanes by depth 4 (dead
            # paths ride along masked). Instead, ONE while_loop carries
            # per-lane (sample index, depth): the moment a lane's path ends
            # (miss, RR kill, or max depth) it accumulates its radiance and
            # immediately regenerates the camera ray of its NEXT
            # progressive sample. The RNG stream is a pure function of
            # (pixel, subframe0 + sample), so every (pixel, sample) value
            # is bit-identical to the lock-step engine — only the
            # iteration schedule changes. Total iterations drop from
            # spl * max_depth to ~spl * E[path length] (+ tail).
            st0 = raygen_state(izero, fzero)

            def regen_cond(c):
                return jnp.any(c[0] < spl)

            def regen_body(c):
                sv, depth, st, acc_r, acc_g, acc_b = c
                was_active = st[13]
                st2 = bounce(depth, st)
                ended = (was_active > 0) & (st2[13] == 0)
                endf = ended.astype(jnp.float32)
                acc_r = acc_r + endf * st2[9]
                acc_g = acc_g + endf * st2[10]
                acc_b = acc_b + endf * st2[11]
                sv = sv + ended.astype(jnp.int32)
                need = ended & (sv < spl)
                fresh = raygen_state(sv, st2[15])
                merged = tuple(
                    old if i == 15 else jnp.where(need, new, old)
                    for i, (new, old) in enumerate(zip(fresh, st2)))
                depth = jnp.where(ended, 0, depth + 1)
                return (sv, depth, merged, acc_r, acc_g, acc_b)

            _, _, st_f, acc_r, acc_g, acc_b = jax.lax.while_loop(
                regen_cond, regen_body,
                (izero, izero, st0, fzero, fzero, fzero))
            count = st_f[15]
        else:
            # Lock-step schedule: spl sequential samples of exactly
            # max_depth bounces each (the original fori form).
            def sample_body(s, accum):
                acc_r, acc_g, acc_b, count = accum
                st = raygen_state(izero + s, count)

                def step(d, stt):
                    return bounce(izero + d, stt)

                st = jax.lax.fori_loop(0, max_depth, step, st)
                return (acc_r + st[9], acc_g + st[10], acc_b + st[11],
                        st[15])

            acc_r, acc_g, acc_b, count = jax.lax.fori_loop(
                0, spl, sample_body, (fzero, fzero, fzero, fzero))
        rad_r_out[...] = acc_r
        rad_g_out[...] = acc_g
        rad_b_out[...] = acc_b
        count_out[...] = count

    return kernel


# Path-regeneration schedule (persistent paths): measured-equal images,
# fewer bounce iterations. Env-gated until the Mosaic while_loop form is
# TPU-profiled (vector loop carries are the risk — the cluster kernels
# deliberately keep vector state in scratch instead).
_REGEN_DEFAULT = os.environ.get("ORT_FUSED_REGEN", "0") != "0"


@functools.partial(
    jax.jit, static_argnames=("width", "height", "samples_per_launch",
                              "max_depth", "full_width", "full_height",
                              "interpret", "regen"))
def render_sum_fused(scene: DeviceScene, cam_params, width: int, height: int,
                     subframe, samples_per_launch: int = 1, max_depth: int = 4,
                     y0=0, x0=0, full_width=None, full_height=None,
                     interpret: bool = False, regen: bool = None):
    """Render `samples_per_launch` progressive samples fully in-kernel.

    Returns (radiance_sum [H, W, 3], rays_traced scalar). Divide by the
    sample count (or merge into a Film) outside.
    """
    full_w = width if full_width is None else full_width
    full_h = height if full_height is None else full_height
    n = width * height
    n_padded = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    grid = (n_padded // BLOCK_RAYS,)
    blk_shape = (n_padded // LANES, LANES)

    # tri_consts column 15 carries the material id (float) for the fused path.
    tri_consts = scene.geom.tri_consts.at[:, 15].set(
        scene.tri_mat.astype(jnp.float32))
    mat_tbl = pack_materials(scene.materials)
    light = pack_light(scene.area_light)
    # ray-cone pixel spread for in-kernel mip LOD (engine.render_sample)
    spread = (2.0 * jnp.linalg.norm(cam_params["V"])
              / (full_h * jnp.maximum(jnp.linalg.norm(cam_params["W"]),
                                      1e-8)))
    cam = pack_camera(cam_params, scene.miss_color, pixel_spread=spread)
    misc = jnp.stack([jnp.asarray(subframe, jnp.int32),
                      jnp.asarray(y0, jnp.int32),
                      jnp.asarray(x0, jnp.int32),
                      jnp.zeros((), jnp.int32)]).reshape(1, 4)

    has_specular = ("glass" in scene.features) or ("mirror" in scene.features)
    prim_kinds = scene.prims.kinds_static
    prim_plane = pack_prims(scene.prims)
    inst_ranges = fused_inst_ranges(scene)
    inst_plane = pack_instances(scene.instances)
    # Instanced scenes keep attrs off: the shade2 plane is object-space
    # (the engine path handles instanced texturing/smoothing).
    tex_cfg = (tex_static(scene)
               if scene.has_textures and not inst_ranges else None)
    smooth = scene.geom.smooth and not inst_ranges
    kernel = _make_kernel(width, height, full_w, full_h,
                          scene.geom.num_triangles, scene.materials.num,
                          max_depth, samples_per_launch,
                          has_specular=has_specular,
                          has_pbr=scene.has_pbr,
                          prim_kinds=prim_kinds,
                          inst_ranges=inst_ranges,
                          regen=(_REGEN_DEFAULT if regen is None
                                 else regen),
                          tex_cfg=tex_cfg, smooth=smooth)

    operands = [tri_consts, prim_plane, inst_plane, mat_tbl, light, cam,
                misc]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 7
    scratch_shapes = []
    attr_onehot = ((tex_cfg or smooth)
                   and scene.geom.num_triangles > TEX_MAX_TRIS)
    if tex_cfg or smooth:
        s2 = pack_shade2(scene)
        if attr_onehot:
            # transposed [128, M_pad] plane for the one-hot winner fetch
            m_pad = -(-s2.shape[0] // LANES) * LANES
            s2t = jnp.zeros((LANES, m_pad), jnp.float32)
            s2t = s2t.at[:32, :s2.shape[0]].set(s2.T)
            operands.append(s2t)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        else:
            operands.append(s2)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if tex_cfg:
        operands.append(pack_tex_table(scene))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if tex_cfg or attr_onehot:
        scratch_shapes.append(pltpu.VMEM((LANES, LANES), jnp.float32))
    if tex_cfg:
        scratch_shapes.append(
            pltpu.VMEM((16, SUBLANES, LANES), jnp.float32))
    if attr_onehot:
        scratch_shapes.append(
            pltpu.VMEM((32, SUBLANES, LANES), jnp.float32))

    out_shapes = tuple(jax.ShapeDtypeStruct(blk_shape, jnp.float32)
                       for _ in range(4))
    blockspec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    rad_r, rad_g, rad_b, count = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(blockspec,) * 4,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)

    rad = jnp.stack([rad_r.reshape(n_padded)[:n],
                     rad_g.reshape(n_padded)[:n],
                     rad_b.reshape(n_padded)[:n]], axis=-1)
    # Padded lanes compute garbage but are sliced off; the count must exclude
    # them, so zero their contribution via the valid-lane prefix.
    lane_valid = (jnp.arange(n_padded) < n).astype(jnp.float32)
    rays_traced = jnp.sum(count.reshape(n_padded) * lane_valid)
    return rad.reshape(height, width, 3), rays_traced
