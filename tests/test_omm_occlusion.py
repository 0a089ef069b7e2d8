"""Opacity micromaps wired into the occlusion path.

The reference's micromaps let traversal skip anyhit invocations for
certain micro-triangles (`optixOpacityMicromap.cpp:29-30`, build input
`optix_host.h:731`). Here: `_scene_any_alpha_omm` answers solid occlusion
with one first-hit-exit query, drops never-blocking triangles, and walks
the anyhit re-entry loop only over UNKNOWN-summary triangles with
per-micro-triangle short-circuits. These tests pin (a) the micro-index
inverse, (b) exact parity with the plain alpha loop, (c) the split's
structure.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from optix_raytracer_tpu.accel import micromap as mm
from optix_raytracer_tpu.core.rays import Rays
from optix_raytracer_tpu.wavefront import intersect as ix


def _shadow_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform([50, 50, 50], [500, 500, 500], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(origin=jnp.asarray(o), direction=jnp.asarray(d),
                tmin=jnp.full((n,), 1e-2, jnp.float32),
                tmax=jnp.full((n,), 1e4, jnp.float32))


class TestMicroIndex:
    def test_inverts_enumeration(self):
        for level in (1, 2, 3):
            tris = mm._micro_corners(level)
            cents = tris.mean(axis=1)
            idx = np.asarray(mm.micro_index(jnp.asarray(cents[:, 0]),
                                            jnp.asarray(cents[:, 1]), level))
            np.testing.assert_array_equal(idx, np.arange(len(tris)))

    def test_random_points_contained(self):
        rng = np.random.default_rng(0)
        level = 3
        tris = mm._micro_corners(level)
        uv = rng.uniform(0, 1, (256, 2)).astype(np.float32)
        keep = uv.sum(axis=1) < 0.99
        uv = uv[keep]
        idx = np.asarray(mm.micro_index(jnp.asarray(uv[:, 0]),
                                        jnp.asarray(uv[:, 1]), level))
        c = tris[idx]
        e1 = c[:, 1] - c[:, 0]
        e2 = c[:, 2] - c[:, 0]
        d = uv - c[:, 0]
        det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        a = (d[:, 0] * e2[:, 1] - d[:, 1] * e2[:, 0]) / det
        b = (e1[:, 0] * d[:, 1] - e1[:, 1] * d[:, 0]) / det
        assert (a >= -1e-4).all() and (b >= -1e-4).all()
        assert (a + b <= 1 + 1e-4).all()


class TestConservativeClassification:
    def test_straddling_micro_tris_are_unknown(self):
        # checker scale 3 on a unit-uv triangle at level 2 (micro side 1/4):
        # cell edges at 1/3 cross micro-tris, which must then be UNKNOWN
        corner_uv = np.array([[[0, 0], [1, 0], [0, 1]]], np.float32)
        st, su = mm.build_opacity_micromap(corner_uv, mm.checker_mask(3.0),
                                           level=2)
        assert su[0] == mm.UNKNOWN_OPAQUE
        assert (st[0] == mm.UNKNOWN_OPAQUE).any()

    def test_aligned_checker_fully_certain(self):
        # checker scale 4 at level 3 (micro side 1/8): every micro-tri lies
        # inside one cell -> no UNKNOWN states anywhere
        corner_uv = np.array([[[0, 0], [1, 0], [0, 1]],
                              [[1, 0], [1, 1], [0, 1]]], np.float32)
        st, su = mm.build_opacity_micromap(corner_uv, mm.checker_mask(4.0),
                                           level=3)
        assert (st != mm.UNKNOWN_OPAQUE).all()
        assert (st == mm.OPAQUE).any() and (st == mm.TRANSPARENT).any()


@pytest.fixture(scope="module")
def cutout_scene():
    from optix_raytracer_tpu.apps.cutouts import cutout_cornell
    return cutout_cornell()


class TestOmmOcclusion:
    def test_scene_split_structure(self, cutout_scene):
        s = cutout_scene
        assert s.has_omm
        total = (s.omm_solid_geom.num_triangles
                 + s.omm_unknown_geom.num_triangles
                 + int((np.asarray(s.omm_summary) == mm.TRANSPARENT).sum()))
        assert total == s.num_triangles
        # the 12 non-cutout Cornell tris are certain occluders
        assert s.omm_solid_geom.num_triangles >= 12

    def test_parity_with_alpha_loop(self, cutout_scene):
        rays = _shadow_rays(2048)
        fast = np.asarray(ix._scene_any_alpha_omm(cutout_scene, rays, None))
        slow = np.asarray(ix._scene_any_alpha(cutout_scene, rays, None))
        # the micro states were built from the same masks the loop
        # evaluates, and the cutout checker (scale 4, level 3) aligns with
        # the micro lattice, so the two paths must agree exactly
        np.testing.assert_array_equal(fast, slow)
        # sanity: rays both occluded and unoccluded exist
        assert 0.0 < fast.mean() < 1.0

    def test_scene_any_dispatches_to_omm(self, cutout_scene):
        rays = _shadow_rays(512, seed=7)
        via_scene = np.asarray(ix.scene_any(cutout_scene, rays, None))
        direct = np.asarray(ix._scene_any_alpha_omm(cutout_scene, rays,
                                                    None))
        np.testing.assert_array_equal(via_scene, direct)

    def test_omm_disable_falls_back(self):
        from optix_raytracer_tpu.apps import cutouts as capp
        from optix_raytracer_tpu.scene import builtins
        from optix_raytracer_tpu.scene.device_scene import make_device_scene
        from optix_raytracer_tpu.shade import materials as mat
        from optix_raytracer_tpu.shade.lights import ParallelogramLight

        verts, idx, tri_mat = builtins.quads_to_triangles(
            builtins._CORNELL_QUADS)
        materials = [dict(m) for m in builtins.CORNELL_MATERIALS]
        materials.append({"kind": mat.DIFFUSE, "base_color": (0.8, 0.8, 0.8),
                          "alpha_mode": mat.ALPHA_MASK,
                          "cutout": mat.CUT_CHECKER, "checker_scale": 4.0})
        tri_mat = np.asarray(tri_mat)
        tri_mat[20:30] = 4
        uvs = np.tile(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
                      (len(verts) // 4, 1))
        light = ParallelogramLight.make(
            builtins.CORNELL_LIGHT_CORNER, builtins.CORNELL_LIGHT_V1,
            builtins.CORNELL_LIGHT_V2, builtins.CORNELL_LIGHT_EMISSION)
        s_off = make_device_scene(verts, idx, tri_mat, materials, uvs=uvs,
                                  area_light=light, opacity_micromaps=False)
        assert not s_off.has_omm
        rays = _shadow_rays(512, seed=9)
        occ_off = np.asarray(ix.scene_any(s_off, rays, None))
        s_on = make_device_scene(verts, idx, tri_mat, materials, uvs=uvs,
                                 area_light=light)
        occ_on = np.asarray(ix.scene_any(s_on, rays, None))
        np.testing.assert_array_equal(occ_on, occ_off)

    def test_fully_opaque_alpha_material_short_circuits(self):
        """An alpha-masked material whose mask never holes must land every
        triangle in the solid set — occlusion then needs no loop at all."""
        from optix_raytracer_tpu.scene.device_scene import make_device_scene
        from optix_raytracer_tpu.shade import materials as mat
        verts = np.array([[-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]],
                         np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        # circle cutout with scale 0.2: the quad's uv*scale stays in
        # [0, 0.2]^2, >= 0.3 away from the cell-center hole circle
        # (radius 0.25 around 0.5) -> never a hole
        mats = [{"kind": mat.DIFFUSE, "base_color": (0.5, 0.5, 0.5),
                 "alpha_mode": mat.ALPHA_MASK, "cutout": mat.CUT_CIRCLE,
                 "checker_scale": 0.2}]
        s = make_device_scene(verts, idx, np.zeros(2, np.int32), mats,
                              uvs=uvs)
        assert s.has_omm
        assert s.omm_solid_geom.num_triangles == 2
        assert s.omm_unknown_geom.num_triangles == 0
