"""Whitted-style integrator: deterministic phong/checker/glass shading with
point-light shadow rays and reflection/refraction continuation.

The behavior of the reference's legacy shading pipeline
(`SDK/cuda/shading.cu`): `phongShade` (`:97`) — ambient + per-light shadowed
diffuse/specular + Kr reflection; `__closesthit__checker_radiance` (`:169`) —
procedural checker selecting phong parameter sets; `__closesthit__glass_
radiance` (`:226`) — fresnel reflect/refract recursion; `__miss__constant_bg`
(`:355`). One deviation, forced by the lock-step wavefront: where the
reference *branches* into both reflection and refraction rays at glass hits,
this integrator picks one per sample with fresnel probability — an unbiased
estimator of the same sum, converging over the progressive accumulation that
every sample already runs (`whitted.cu:44-98` jittered subframes).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import rng as _rng
from ..core.camera import generate_rays
from ..core.rays import Rays
from ..core.vecmath import dot, normalize, reflect, refract
from ..shade import materials as mats
from ..shade.lights import sample_light
from ..scene.device_scene import DeviceScene
from .engine import RAY_TMIN, SHADOW_TMAX_SCALE
from .intersect import scene_any, scene_closest


def _checker(uv, scale):
    """Procedural checkerboard mask from surface uv (shading.cu checker CH)."""
    cu = jnp.floor(uv[..., 0] * scale)
    cv = jnp.floor(uv[..., 1] * scale)
    return jnp.mod(cu + cv, 2.0) < 1.0


def trace_whitted(scene: DeviceScene, rays: Rays, rng, max_depth: int = 8,
                  chunk_size: Optional[int] = None):
    """Whitted radiance for a flat wavefront [N] → ([N, 3], rng)."""
    n_rays = rays.tmin.shape[0]
    num_lights = scene.lights.num

    state = dict(
        rays=rays,
        throughput=jnp.ones((n_rays, 3), jnp.float32),
        radiance=jnp.zeros((n_rays, 3), jnp.float32),
        rng=rng,
        active=jnp.ones((n_rays,), bool),
    )

    def bounce(depth, state):
        rays = state["rays"]
        active = state["active"]
        throughput = state["throughput"]
        radiance = state["radiance"]
        rng = state["rng"]

        hits = scene_closest(scene, rays, chunk_size=chunk_size)
        hit_valid = hits.valid & active

        radiance = radiance + jnp.where(
            (active & ~hits.valid)[..., None],
            throughput * scene.miss_color, 0.0)

        m = mats.gather(scene.materials, hits.mat_id)
        d = rays.direction
        geom_n = hits.normal
        albedo_tex = None
        if scene.geom.smooth and not scene.has_textures:
            # Smooth vertex normals without textures (whitted.cu:160-168
            # interpolates shading normals unconditionally).
            from ..accel.geometry import shading_frame
            is_tri = hits.prim_id < scene.num_triangles
            frame = shading_frame(scene.geom,
                                  jnp.minimum(jnp.maximum(hits.prim_id, 0),
                                              scene.num_triangles - 1),
                                  hits.uv)
            geom_n = jnp.where(is_tri[..., None], frame["shading_normal"],
                               geom_n)
        if scene.has_textures:
            from ..accel.geometry import shading_frame
            from ..shade.texture import sample_bilinear
            is_tri = hits.prim_id < scene.num_triangles
            frame = shading_frame(scene.geom,
                                  jnp.minimum(jnp.maximum(hits.prim_id, 0),
                                              scene.num_triangles - 1),
                                  hits.uv)
            geom_n = jnp.where(is_tri[..., None], frame["shading_normal"],
                               geom_n)
            rgba = sample_bilinear(scene.textures, scene.tex_size,
                                   jnp.where(is_tri, m["base_tex"], -1),
                                   frame["uv"])
            albedo_tex = rgba[..., :3]
        n = geom_n * jnp.sign(-dot(geom_n, d))[..., None]
        hit_p = rays.at(hits.t)

        kind = m["kind"]
        is_glass = kind == mats.GLASS
        is_mirror = ((kind == mats.PBR) & (m["metallic"] > 0.99)
                     & (m["roughness"] <= 0.05))
        is_specular = is_glass | is_mirror
        is_phongish = ~is_specular
        radiance = radiance + jnp.where(hit_valid[..., None],
                                        throughput * m["emission"], 0.0)

        # checker: select diffuse color by the procedural mask
        on_primary = _checker(hits.uv, m["checker_scale"])
        kd = jnp.where((kind == mats.CHECKER)[..., None] & ~on_primary[..., None],
                       m["checker1"], m["base_color"])
        if albedo_tex is not None:
            kd = kd * albedo_tex
        ks = m["specular"]

        # --- per-light direct lighting with shadow rays ---
        # Phong materials get the phongShade lobes (`shading.cu:97`); PBR
        # materials get the metallic-roughness GGX/Schlick model of the
        # whitted closest-hit (`whitted.cu:170-260`).
        refl_view = normalize(reflect(d, n))
        wo = -d
        n_dv = jnp.maximum(dot(n, wo), 1e-4)
        is_pbr = kind == mats.PBR
        rough = jnp.maximum(m["roughness"], 0.05)
        alpha2 = (rough * rough) ** 2
        f0 = (0.04 * (1.0 - m["metallic"]))[..., None] \
            + m["metallic"][..., None] * kd
        kd_pbr = kd * (1.0 - m["metallic"])[..., None]

        direct = jnp.zeros_like(kd)
        for li in range(num_lights):
            wi, dist, lrad, is_ambient, rng = sample_light(
                scene.lights, li, hit_p, rng)
            n_dl = jnp.maximum(dot(n, wi), 0.0)
            shadow_rays = Rays(origin=hit_p, direction=wi,
                               tmin=jnp.full(dist.shape, RAY_TMIN, jnp.float32),
                               tmax=dist * SHADOW_TMAX_SCALE)
            occ = scene_any(scene, shadow_rays, chunk_size=chunk_size)
            lit = jnp.where(is_ambient, 1.0,
                            (~occ).astype(jnp.float32) *
                            jnp.where(n_dl > 0, 1.0, 0.0))
            # phongShade: diffuse kd·nDl + specular ks·(r·wi)^exp
            spec_phong = ks * jnp.power(
                jnp.maximum(dot(refl_view, wi), 1e-6),
                m["phong_exp"])[..., None]
            # GGX: D·G·F / (4·nDl·nDv), half-vector form (whitted.cu ggxNormal)
            h = normalize(wi + wo)
            n_dh = jnp.maximum(dot(n, h), 0.0)
            denom_d = n_dh * n_dh * (alpha2 - 1.0) + 1.0
            dist_d = alpha2 / jnp.maximum(jnp.pi * denom_d * denom_d, 1e-8)
            k_g = (rough + 1.0) ** 2 / 8.0
            g_v = n_dv / (n_dv * (1 - k_g) + k_g)
            g_l = n_dl / jnp.maximum(n_dl * (1 - k_g) + k_g, 1e-8)
            fres = f0 + (1.0 - f0) * (1.0 - jnp.maximum(
                dot(h, wo), 0.0))[..., None] ** 5
            spec_ggx = fres * (dist_d * g_v * g_l
                               / jnp.maximum(4.0 * n_dv * n_dl, 1e-8))[..., None]
            diffuse_col = jnp.where(is_pbr[..., None], kd_pbr / jnp.pi, kd)
            spec = jnp.where(is_pbr[..., None], spec_ggx * n_dl[..., None],
                             spec_phong)
            # (phong keeps the reference's unnormalized kd·nDl convention)
            diff_term = jnp.where(is_pbr[..., None],
                                  diffuse_col * n_dl[..., None] * jnp.pi,
                                  kd * n_dl[..., None])
            term = jnp.where(is_ambient[..., None], kd * lrad,
                             (diff_term + spec) * lrad)
            direct = direct + term * lit[..., None]

        radiance = radiance + jnp.where((hit_valid & is_phongish)[..., None],
                                        throughput * direct, 0.0)

        # --- continuation ray ---
        d_mirror = refl_view
        entering = dot(d, geom_n) < 0.0
        eta = jnp.where(entering, 1.0 / m["ior"], m["ior"])
        d_refr, refr_ok = refract(d, n, eta)
        cos_i = jnp.clip(-dot(d, n), 0.0, 1.0)
        r0 = ((m["ior"] - 1.0) / (m["ior"] + 1.0)) ** 2
        fresnel = r0 + (1.0 - r0) * (1.0 - cos_i) ** 5
        u, _, rng = _rng.uniform2(rng)
        gl_reflect = (~refr_ok) | (u < fresnel)
        d_glass = jnp.where(gl_reflect[..., None], d_mirror,
                            normalize(d_refr))

        new_dir = jnp.where(is_glass[..., None], d_glass, d_mirror)

        # throughput: glass → kr tint (shading.cu glass params);
        # phong/checker/mirror → kr reflectivity; zero kr ends the path.
        kr = m["kr"]
        new_throughput = throughput * kr
        continues = hit_valid & jnp.any(kr > 0.0, axis=-1)

        offset_n = jnp.where(dot(new_dir, n)[..., None] >= 0.0, n, -n)
        new_rays = Rays(origin=hit_p + offset_n * RAY_TMIN,
                        direction=new_dir,
                        tmin=jnp.full(hits.t.shape, RAY_TMIN, jnp.float32),
                        tmax=jnp.full(hits.t.shape, 1e16, jnp.float32))

        return dict(rays=new_rays, throughput=new_throughput,
                    radiance=radiance, rng=rng, active=continues)

    state = jax.lax.fori_loop(0, max_depth, bounce, state)
    return state["radiance"], state["rng"]


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "max_depth",
                                    "chunk_size"))
def render_whitted_sample(scene: DeviceScene, cam_params, width: int,
                          height: int, subframe, max_depth: int = 8,
                          chunk_size: Optional[int] = None):
    """One jittered whitted sample for the full frame → [H, W, 3]."""
    n = width * height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    rng = _rng.seed(pixel_idx, jnp.asarray(subframe, jnp.uint32))
    rng2d = rng.reshape(height, width)
    rays, rng2d = generate_rays(cam_params, width, height, rng_state=rng2d)
    rays = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), rays)
    radiance, _ = trace_whitted(scene, rays, rng2d.reshape(n),
                                max_depth=max_depth, chunk_size=chunk_size)
    return radiance.reshape(height, width, 3)
