"""Scene-level intersection: triangles + custom primitives, merged.

The dispatch role of the reference's two-level traversal + SBT: a scene's GAS
set (triangle meshes and custom-primitive AABB inputs,
`SDK/optixWhitted/optixWhitted.cpp:381-430`) resolves to one closest hit. Ids
stay disjoint: custom prim i reports prim_id = num_triangles + i.
"""
from __future__ import annotations

from typing import Optional

import jax

from ..accel import bruteforce as bf
from ..accel import clusters as cluster_mod
from ..accel import primitives as prim_mod
from ..accel import traverse as trav
from ..accel.bruteforce import _TPU_PLATFORMS
from ..accel.pallas_bf import MAX_SMEM_TRIS
from ..core.rays import Hits, Rays
from ..scene.device_scene import DeviceScene


def _use_clusters(scene: DeviceScene) -> bool:
    # Large-mesh hot path: the cluster-culled Pallas kernels (TPU only).
    return (scene.has_clusters
            and jax.default_backend() in _TPU_PLATFORMS)


def _use_qwalk() -> bool:
    """Opt-in cluster-major queue traversal for scattered/mixed-liveness
    wavefronts (accel/qwalk.py) — flat octet-granularity work lists
    instead of the lock-step gated walk. A/B via ORT_QWALK=1 until the
    TPU numbers pick a default (tools/profile_qwalk.py)."""
    import os
    return os.environ.get("ORT_QWALK", "0") == "1"


def _use_bvh(scene: DeviceScene) -> bool:
    # Brute force wins while the whole mesh fits the fused kernel's SMEM
    # budget; beyond that the threaded LBVH takes over (when built).
    return scene.has_bvh and scene.geom.num_triangles > MAX_SMEM_TRIS


def _flat_call(fn, rays: Rays):
    """Run a flat-[N]-only intersector over rays of any batch shape."""
    batch_shape = rays.batch_shape
    n = 1
    for s in batch_shape:
        n *= s
    flat = jax.tree.map(
        lambda a: a.reshape((n,) + a.shape[len(batch_shape):]), rays)
    out = fn(flat)
    return jax.tree.map(
        lambda a: a.reshape(batch_shape + a.shape[1:]), out)


def _merge_motion_closest(scene: DeviceScene, hits: Hits, rays: Rays,
                          times):
    """Fold time-sampled motion-triangle hits into the static result.

    Motion prim ids live past triangles AND custom prims; material ids come
    from the motion mesh's own table (`optixSimpleMotionBlur` motion GAS in
    the standard launch)."""
    import jax.numpy as jnp
    from ..accel import motion as motion_mod

    if times is None:
        times = jnp.zeros(rays.tmin.shape, jnp.float32)
    mh = motion_mod.intersect_motion_triangles(scene.motion_geom, rays,
                                               times)
    mat = scene.motion_tri_mat[jnp.maximum(mh.prim_id, 0)]
    mh = mh.replace(mat_id=jnp.where(mh.valid, mat, -1))
    return prim_mod.merge_hits(
        hits, mh, prim_offset=scene.num_triangles + scene.prims.num)


def scene_closest(scene: DeviceScene, rays: Rays,
                  chunk_size: Optional[int] = None, times=None,
                  coherent: bool = True, exact: bool = False,
                  group_walk=None) -> Hits:
    """coherent=False marks scattered rays (bounce/shadow wavefronts): the
    cluster path then pre-sorts them into spatially coherent blocks — the
    wavefront-style `optixReorder` SER role (`optix_device.h:184`).
    Tile-ordered primaries keep coherent=True and skip the sort cost.
    exact=True (for already-sorted scattered wavefronts — the engine's
    per-bounce state sort) runs the per-ray exact block cull instead of
    the conservative interval cull. group_walk overrides the walk's
    32-ray group gating (None = ORT_GROUP_WALK env default): sample-major
    wavefronts force it ON — their groups share a pixel, so the gate's
    crossing bits are tight (measured +6% e2e); it is a wash on sorted
    strangers."""
    if scene.has_instances:
        from ..accel import tlas
        mc = (scene.instance_clusters or None) if (
            jax.default_backend() in _TPU_PLATFORMS) else None
        hits = _flat_call(
            lambda r: tlas.intersect_instances(
                scene.geom, scene.instances, r, tri_mat=scene.tri_mat,
                chunk_size=chunk_size, mesh_clusters=mc), rays)
    elif _use_clusters(scene):
        if (exact or not coherent) and _use_qwalk():
            # Scattered/mixed wavefront via the queue: the flat work list
            # is sort-independent (cluster-major exact crossings), so no
            # pre-sort is required either.
            from ..accel import qwalk as qwalk_mod
            hits = _flat_call(
                lambda r: qwalk_mod.closest_hit(scene.clusters, r), rays)
        elif coherent:
            hits = _flat_call(
                lambda r: cluster_mod.closest_hit(scene.clusters, r,
                                                  exact=exact,
                                                  group_walk=group_walk),
                rays)
        else:
            hits = _flat_call(
                lambda r: cluster_mod.closest_hit_sorted(
                    scene.clusters, r, group_walk=group_walk),
                rays)
    elif _use_bvh(scene):
        # Chunked: one unbounded while_loop over a multi-million-ray
        # wavefront runs past the device watchdog (the slowest ray stalls
        # every lane); fixed-size chunks bound each kernel invocation.
        hits = _flat_call(
            lambda r: bf._chunked(
                lambda c: trav.traverse(scene.bvh, scene.geom,
                                        scene.tri_mat, c),
                r, chunk_size), rays)
    else:
        hits = bf.intersect_closest(scene.geom, rays, tri_mat=scene.tri_mat,
                                    chunk_size=chunk_size)
    if scene.prims.num:
        ph = prim_mod.intersect_prims_closest(scene.prims, rays)
        hits = prim_mod.merge_hits(hits, ph,
                                   prim_offset=scene.num_triangles)
    if scene.has_motion:
        hits = _merge_motion_closest(scene, hits, rays, times)
    return hits


def scene_any(scene: DeviceScene, rays: Rays,
              chunk_size: Optional[int] = None, times=None,
              coherent: bool = True, group_walk=None):
    if scene.has_cutouts:
        # has_omm is only set at build time when the scene qualifies (no
        # instances; prim/motion materials cutout-free — device_scene.py);
        # the path itself handles clusters, prims and motion.
        if scene.has_omm:
            return _scene_any_alpha_omm(scene, rays, chunk_size,
                                        times=times, coherent=coherent,
                                        group_walk=group_walk)
        return _scene_any_alpha(scene, rays, chunk_size)
    if scene.has_instances:
        from ..accel import tlas
        mc = (scene.instance_clusters or None) if (
            jax.default_backend() in _TPU_PLATFORMS) else None
        occ = _flat_call(
            lambda r: tlas.intersect_instances_any(
                scene.geom, scene.instances, r, chunk_size=chunk_size,
                mesh_clusters=mc),
            rays)
    elif _use_clusters(scene):
        if _use_qwalk():
            # NEE shadow wavefronts are always mixed-liveness — the queue
            # only enqueues live crossings, so it applies coherent or not.
            from ..accel import qwalk as qwalk_mod
            occ = _flat_call(
                lambda r: qwalk_mod.any_hit(scene.clusters, r), rays)
        elif coherent:
            # NEE shadow wavefronts are mixed-liveness even when
            # tile-coherent; the exact cull's per-ray union lists ~4x
            # fewer clusters than the interval cull there (measured on
            # the 25k-knot shadow wavefront), so any-hit always takes it.
            occ = _flat_call(
                lambda r: cluster_mod.any_hit(scene.clusters, r, exact=True,
                                              group_walk=group_walk), rays)
        else:
            occ = _flat_call(
                lambda r: cluster_mod.any_hit_sorted(
                    scene.clusters, r, group_walk=group_walk),
                rays)
    elif _use_bvh(scene):
        occ = _flat_call(
            lambda r: bf._chunked(
                lambda c: trav.traverse(scene.bvh, scene.geom, None, c,
                                        any_hit=True),
                r, chunk_size), rays)
    else:
        occ = bf.intersect_any(scene.geom, rays, chunk_size=chunk_size)
    if scene.prims.num:
        occ = occ | prim_mod.intersect_prims_any(scene.prims, rays)
    if scene.has_motion:
        import jax.numpy as jnp
        from ..accel import motion as motion_mod
        tt = (times if times is not None
              else jnp.zeros(rays.tmin.shape, jnp.float32))
        mh = motion_mod.intersect_motion_triangles(scene.motion_geom, rays,
                                                   tt)
        occ = occ | mh.valid
    return occ


def _eval_hole(scene: DeviceScene, m, uv, tex_ok=True):
    """Alpha-mask hole test for gathered material rows `m` at texture
    coordinates `uv` — the anyhit `optixIgnoreIntersection` decision
    (`optixCutouts.cu:295,337`). tex_ok=False disables the CUT_TEXTURE
    branch (callers whose uv is not a real texture coordinate)."""
    import jax.numpy as jnp
    from ..shade.materials import CUT_CHECKER, CUT_CIRCLE, CUT_TEXTURE
    from ..shade.texture import sample_bilinear

    fu = uv * m["checker_scale"][..., None]
    cell = fu - jnp.floor(fu) - 0.5
    checker_hole = jnp.mod(jnp.floor(fu[..., 0])
                           + jnp.floor(fu[..., 1]), 2.0) < 1.0
    circle_hole = (cell[..., 0] ** 2 + cell[..., 1] ** 2) < 0.25 ** 2
    if scene.has_textures and tex_ok is not False:
        tid = m["base_tex"]
        if tex_ok is not True:
            tid = jnp.where(tex_ok, tid, -1)
        rgba = sample_bilinear(scene.textures, scene.tex_size, tid, uv)
        tex_hole = rgba[..., 3] < m["alpha_cutoff"]
    else:
        tex_hole = jnp.zeros_like(checker_hole)
    cut_kind = m["cutout"]
    hole = jnp.where(cut_kind == CUT_CHECKER, checker_hole,
                     jnp.where(cut_kind == CUT_CIRCLE, circle_hole,
                               jnp.where(cut_kind == CUT_TEXTURE,
                                         tex_hole, False)))
    return (m["alpha_mode"] == 1) & hole


def cutout_hole_mask(scene: DeviceScene, hits: Hits):
    """True where a hit lands in an alpha-mask hole — the anyhit
    `optixIgnoreIntersection` decision (`optixCutouts.cu:295,337`)."""
    import jax.numpy as jnp
    from ..accel.geometry import shading_frame
    from ..shade import materials as mats

    m = mats.gather(scene.materials, hits.mat_id)
    is_tri = hits.prim_id < scene.num_triangles
    frame = shading_frame(scene.geom,
                          jnp.minimum(jnp.maximum(hits.prim_id, 0),
                                      scene.num_triangles - 1), hits.uv)
    uv = jnp.where(is_tri[..., None], frame["uv"], hits.uv)
    return hits.valid & _eval_hole(scene, m, uv, tex_ok=is_tri)


def _scene_any_alpha_omm(scene: DeviceScene, rays: Rays, chunk_size,
                         max_steps: int = 64, times=None,
                         coherent: bool = True, group_walk=None):
    """Occlusion with opacity micromaps wired into the anyhit path.

    The traversal-skips-anyhit behavior of `optixOpacityMicromap.cpp:29-30`
    (build input `optix_host.h:731`), restructured for a wavefront:

    1. Triangles CERTAIN to occlude (summary OPAQUE + all non-cutout
       geometry) answer with one first-hit-exit any-hit query — no alpha
       loop, exactly as the driver never calls the anyhit program for
       opaque micro-triangles. Large solid splits run the Pallas cluster
       any-hit (scene.omm_solid_clusters); custom prims and motion
       triangles (cutout-free by the build-time gate) fold in here too.
    2. Summary-TRANSPARENT triangles are in no occlusion set at all —
       they can never block light, so rays pass them for free.
    3. Only summary-UNKNOWN triangles run the re-entry loop, and each hit
       first consults its micro-triangle state (micro_index of the hit
       barycentric): micro OPAQUE → occluded, micro TRANSPARENT →
       pass-through, micro UNKNOWN → evaluate the mask (the anyhit
       program, `optixCutouts.cu:295,337`).

    Rays already blocked by step 1 skip the loop (they start `done`).
    """
    import jax
    import jax.numpy as jnp
    from ..accel import bruteforce as bf
    from ..accel.geometry import shading_frame
    from ..accel.micromap import OPAQUE, TRANSPARENT, micro_index
    from ..shade import materials as mats

    solid_cs = scene.omm_solid_clusters
    if (solid_cs.num_clusters
            and jax.default_backend() in _TPU_PLATFORMS):
        if coherent:
            occ0 = _flat_call(
                lambda r: cluster_mod.any_hit(solid_cs, r, exact=True,
                                              group_walk=group_walk), rays)
        else:
            occ0 = _flat_call(
                lambda r: cluster_mod.any_hit_sorted(
                    solid_cs, r, group_walk=group_walk), rays)
    elif scene.omm_solid_geom.num_triangles:
        occ0 = bf.intersect_any(scene.omm_solid_geom, rays,
                                chunk_size=chunk_size)
    else:
        occ0 = jnp.zeros(rays.tmin.shape, bool)
    if scene.prims.num:
        occ0 = occ0 | prim_mod.intersect_prims_any(scene.prims, rays)
    if scene.has_motion:
        from ..accel import motion as motion_mod
        tt = (times if times is not None
              else jnp.zeros(rays.tmin.shape, jnp.float32))
        mh = motion_mod.intersect_motion_triangles(scene.motion_geom, rays,
                                                   tt)
        occ0 = occ0 | mh.valid
    if not scene.omm_unknown_geom.num_triangles:
        return occ0

    geom = scene.omm_unknown_geom
    # Per-lane random gathers are TPU-hostile; every per-hit table fetch
    # below is a one-hot MXU contraction instead (the same trick as
    # materials._gather_onehot). The [T] per-unknown-triangle rows are
    # pre-gathered once per call (T rows, not N).
    n_unknown = geom.num_triangles
    micro_f = scene.omm_micro[scene.omm_unknown_ids
                              ].astype(jnp.float32)        # [T, 4^level]
    mat_unknown = scene.tri_mat[scene.omm_unknown_ids]     # [T]

    def body(state):
        k, cur, occluded, done = state
        hits = bf.intersect_closest(geom, cur, chunk_size=chunk_size)
        pid = jnp.maximum(hits.prim_id, 0)
        oh = jax.nn.one_hot(pid, n_unknown, dtype=jnp.float32)  # [N, T]
        mid = micro_index(hits.uv[..., 0], hits.uv[..., 1], scene.omm_level)
        rows = oh @ micro_f                                     # [N, 64]
        st = jnp.round(jnp.sum(
            rows * jax.nn.one_hot(mid, micro_f.shape[1],
                                  dtype=jnp.float32), -1)).astype(jnp.int32)
        mat_id = jnp.round(oh @ mat_unknown.astype(jnp.float32)
                           ).astype(jnp.int32)
        m = mats.gather(scene.materials, mat_id)
        uv = shading_frame(geom, pid, hits.uv)["uv"]
        hole = jnp.where(st == TRANSPARENT, True,
                         jnp.where(st == OPAQUE, False,
                                   _eval_hole(scene, m, uv)))
        solid = hits.valid & ~hole
        occluded = occluded | (solid & ~done)
        done = done | solid | ~hits.valid
        new_tmin = hits.t + 1e-2
        cur = Rays(origin=cur.origin, direction=cur.direction,
                   tmin=jnp.where(done, cur.tmin, new_tmin),
                   tmax=cur.tmax)
        return k + 1, cur, occluded, done

    def cond(state):
        k, _, _, done = state
        return (k < max_steps) & jnp.any(~done)

    zeros = jnp.zeros(rays.tmin.shape, bool)
    k, _, occluded, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rays, zeros, occ0))
    # Backstop: unresolved rays after max_steps count as blocked.
    return occ0 | occluded | ~done


def _scene_any_alpha(scene: DeviceScene, rays: Rays, chunk_size,
                     max_steps: int = 64):
    """Occlusion with alpha-mask pass-through: re-enter past masked
    surfaces until every ray is resolved (the reference's anyhit program
    re-enters unboundedly, `optixCutouts.cu:295,337`).

    A `lax.while_loop` exits as soon as all rays are done, so typical
    scenes pay for the 1-3 surfaces they actually cross; `max_steps` is
    only the infinite-loop backstop (a ray threading more than 64 masked
    surfaces is conservatively declared blocked, and the bound is covered
    by a test at tests/test_intersect.py)."""
    import jax
    import jax.numpy as jnp

    def body(state):
        k, cur, occluded, done = state
        hits = scene_closest(scene, cur, chunk_size=chunk_size)
        hole = cutout_hole_mask(scene, hits)
        solid = hits.valid & ~hole
        occluded = occluded | (solid & ~done)
        done = done | solid | ~hits.valid
        # step past the masked surface
        new_tmin = hits.t + 1e-2
        cur = Rays(origin=cur.origin, direction=cur.direction,
                   tmin=jnp.where(done, cur.tmin, new_tmin),
                   tmax=cur.tmax)
        return k + 1, cur, occluded, done

    def cond(state):
        k, _, _, done = state
        return (k < max_steps) & jnp.any(~done)

    zeros = jnp.zeros(rays.tmin.shape, bool)
    k, _, occluded, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rays, zeros, zeros))
    # Backstop: unresolved rays after max_steps count as blocked.
    return occluded | ~done
