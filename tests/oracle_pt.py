"""Independent numpy path-tracer oracle for validating the JAX engine.

Deliberately a *different* implementation path: Möller–Trumbore intersection
(the JAX engine uses Woop unit-triangle transforms), numpy RNG (the engine uses
TEA/PCG), recursion structured per-bounce over flat ray batches. Same estimator
(NEE on the parallelogram light + cosine BSDF + emission-on-primary), so the
two renders must agree in expectation.
"""
import numpy as np


def intersect_closest(v0, e1, e2, o, d, tmin, tmax):
    """Vectorized MT: o,d [N,3] vs triangles [M,3] → (t, prim, u, v)."""
    pvec = np.cross(d[:, None, :], e2[None, :, :])                # [N,M,3]
    det = np.einsum("mk,nmk->nm", e1, pvec)
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = o[:, None, :] - v0[None, :, :]
    u = np.einsum("nmk,nmk->nm", tvec, pvec) * inv_det
    qvec = np.cross(tvec, e1[None, :, :])
    v = np.einsum("nk,nmk->nm", d, qvec) * inv_det
    t = np.einsum("mk,nmk->nm", e2, qvec) * inv_det
    ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > tmin[:, None]) & (t < tmax[:, None]))
    t = np.where(ok, t, np.inf)
    prim = np.argmin(t, axis=1)
    tbest = t[np.arange(len(o)), prim]
    hit = np.isfinite(tbest)
    return np.where(hit, tbest, tmax), np.where(hit, prim, -1)


def intersect_any(v0, e1, e2, o, d, tmin, tmax):
    t, prim = intersect_closest(v0, e1, e2, o, d, tmin, tmax)
    return prim >= 0


def render_oracle(scene_np, cam, width, height, samples, max_depth, seed=0,
                  rng=None):
    """scene_np: dict with v0,e1,e2,normal [M,3], mat_albedo/mat_emission [M,3],
    light dict(corner,v1,v2,normal,emission,area). Returns [H,W,3] mean.

    rng: pass a persistent np.random.Generator to render in resumable
    chunks — draws are strictly sequential per sample, so chunked calls
    sharing one Generator reproduce the single-call render bit-exactly
    (tools/oracle_runner.py relies on this)."""
    if rng is None:
        rng = np.random.default_rng(seed)
    v0, e1, e2 = scene_np["v0"], scene_np["e1"], scene_np["e2"]
    normals = scene_np["normal"]
    albedo_m = scene_np["mat_albedo"]
    emission_m = scene_np["mat_emission"]
    light = scene_np["light"]
    n_pix = width * height

    eye, U, V, W = (np.asarray(cam[k], np.float64) for k in ["eye", "U", "V", "W"])
    accum = np.zeros((n_pix, 3))

    ix = np.tile(np.arange(width), height)
    iy = np.repeat(np.arange(height), width)

    for s in range(samples):
        jx = rng.random(n_pix)
        jy = rng.random(n_pix)
        dx = 2.0 * ((ix + jx) / width) - 1.0
        dy = 1.0 - 2.0 * ((iy + jy) / height)
        d = dx[:, None] * U + dy[:, None] * V + W
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.tile(eye, (n_pix, 1))

        throughput = np.ones((n_pix, 3))
        radiance = np.zeros((n_pix, 3))
        active = np.ones(n_pix, bool)
        prev_spec = np.ones(n_pix, bool)

        for depth in range(max_depth):
            tmin = np.full(n_pix, 1e-2)
            tmax = np.full(n_pix, 1e16)
            t, prim = intersect_closest(v0, e1, e2, o, d, tmin, tmax)
            hit = (prim >= 0) & active
            pid = np.maximum(prim, 0)

            n = normals[pid]
            n = n * np.sign(-np.einsum("nk,nk->n", n, d))[:, None]
            p = o + t[:, None] * d
            alb = albedo_m[pid]
            emi = emission_m[pid]

            radiance += np.where((hit & prev_spec)[:, None], throughput * emi, 0)

            # NEE
            u1 = rng.random(n_pix)
            u2 = rng.random(n_pix)
            lp = light["corner"] + u1[:, None] * light["v1"] + u2[:, None] * light["v2"]
            delta = lp - p
            dist2 = np.maximum(np.einsum("nk,nk->n", delta, delta), 1e-12)
            dist = np.sqrt(dist2)
            wi = delta / dist[:, None]
            ndl = np.einsum("nk,nk->n", n, wi)
            lndl = np.abs(np.einsum("k,nk->n", light["normal"], wi))
            occ = intersect_any(v0, e1, e2, p, wi,
                                np.full(n_pix, 1e-2), dist * (1 - 1e-3))
            w_l = np.where((ndl > 0) & ~occ,
                           ndl * lndl * light["area"] / (np.pi * dist2), 0.0)
            radiance += np.where(hit[:, None],
                                 throughput * alb * light["emission"] * w_l[:, None], 0)

            # cosine sample
            u3 = rng.random(n_pix)
            u4 = rng.random(n_pix)
            r = np.sqrt(u3)
            phi = 2 * np.pi * u4
            # build ONB
            sign = np.where(n[:, 2] >= 0, 1.0, -1.0)
            a = -1.0 / (sign + n[:, 2])
            b = n[:, 0] * n[:, 1] * a
            tvec = np.stack([1 + sign * n[:, 0] ** 2 * a, sign * b, -sign * n[:, 0]], 1)
            bvec = np.stack([b, sign + n[:, 1] ** 2 * a, -n[:, 1]], 1)
            local = np.stack([r * np.cos(phi), r * np.sin(phi),
                              np.sqrt(np.maximum(0, 1 - u3))], 1)
            nd = local[:, 0:1] * tvec + local[:, 1:2] * bvec + local[:, 2:3] * n

            throughput = throughput * alb
            # RR
            if depth >= 1:
                q = np.clip(throughput.max(axis=1), 0.05, 1.0)
                u5 = rng.random(n_pix)
                survive = u5 < q
                throughput = throughput / q[:, None]
                active = active & survive

            o = p + n * 1e-2 * np.sign(np.einsum("nk,nk->n", nd, n))[:, None]
            d = nd
            active = active & hit
            prev_spec = np.zeros(n_pix, bool)  # all-diffuse scene: NEE covers emitters

        accum += radiance
    return (accum / samples).reshape(height, width, 3)


def scene_to_numpy(scene):
    """DeviceScene → plain numpy dict for the oracle."""
    import numpy as np
    g = scene.geom
    tri_mat = np.asarray(scene.tri_mat)
    return {
        "v0": np.asarray(g.v0, np.float64),
        "e1": np.asarray(g.e1, np.float64),
        "e2": np.asarray(g.e2, np.float64),
        "normal": np.asarray(g.face_normal, np.float64),
        "mat_albedo": np.asarray(scene.materials.base_color)[tri_mat],
        "mat_emission": np.asarray(scene.materials.emission)[tri_mat],
        "light": {
            "corner": np.asarray(scene.area_light.corner, np.float64),
            "v1": np.asarray(scene.area_light.v1, np.float64),
            "v2": np.asarray(scene.area_light.v2, np.float64),
            "normal": np.asarray(scene.area_light.normal, np.float64),
            "emission": np.asarray(scene.area_light.emission, np.float64),
            "area": float(scene.area_light.area),
        },
    }
