"""In-kernel textures in the fused megakernel vs the XLA engine.

The megakernel's texture unit (wavefront/pallas_pt.py fetch_bundle16)
reproduces the engine's sample_bundle semantics — trilinear mipmapped
material-bundle fetches with ray-cone LOD, plus base/normal/emissive/
metallic-roughness map application (`SDK/cuda/whitted.cu:160-168`,
`MaterialData.h:62-103`). Filtering runs in bf16 on the MXU by default
(finer than GPU texture units' 8-bit fixed-point weights); ORT_TEX_F32=1
switches to f32, under which the kernel must match the engine exactly
(folded-weight reassociation only). Kernel runs in interpreter mode on
CPU — the same code the TPU compiles."""
import os

import numpy as np
import pytest

from optix_raytracer_tpu.core.camera import Camera
from optix_raytracer_tpu.scene.device_scene import make_device_scene
from optix_raytracer_tpu.shade import materials as mat
from optix_raytracer_tpu.shade.lights import ParallelogramLight
from optix_raytracer_tpu.wavefront.engine import render_sample
from optix_raytracer_tpu.wavefront.pallas_pt import (TEX_MAX_TRIS,
                                                     render_sum_fused,
                                                     tex_static)

W = H = 32


def _textured_scene(metallic=0.6, rough=0.8, smooth=False, maps="all"):
    """Tilted textured quad + 4x-tiled floor — UV wrap, mip LOD gradient
    along the floor, all four map kinds."""
    rng = np.random.default_rng(7)
    tex_base = rng.uniform(0.1, 0.9, (32, 32, 3)).astype(np.float32)
    nm = rng.normal(0, 0.2, (16, 16, 3)).astype(np.float32)
    nm[..., 2] = 1.0
    nm /= np.linalg.norm(nm, axis=-1, keepdims=True)
    tex_norm = (nm * 0.5 + 0.5).astype(np.float32)
    tex_mr = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    tex_em = rng.uniform(0, 0.2, (8, 8, 3)).astype(np.float32)
    s = 3.0
    verts = np.array([[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s],
                      [-1, 0, -0.5], [1, 0, -0.5],
                      [1, 1.6, -0.5], [-1, 1.6, -0.5]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7]], np.int32)
    uvs = np.array([[0, 0], [4, 0], [4, 4], [0, 4],
                    [0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
    normals = None
    if smooth:
        normals = np.zeros((8, 3), np.float32)
        normals[:4] = (0, 1, 0)
        nr = np.array([0.3, 0.2, -0.93], np.float32)
        normals[4:] = nr / np.linalg.norm(nr)
    m = {"kind": mat.PBR, "base_color": (1, 1, 1), "base_tex": 0,
         "emission": (1.0, 1.0, 1.0), "metallic": metallic,
         "roughness": rough}
    if maps == "all":
        m.update(normal_tex=1, mr_tex=2, emissive_tex=3)
    light = ParallelogramLight.make((-1.0, 3.0, -1.0), (2, 0, 0),
                                    (0, 0, 2), (8.0, 8.0, 8.0))
    return make_device_scene(verts, idx, np.zeros(4, np.int32), [m],
                             uvs=uvs, normals=normals,
                             textures=[tex_base, tex_norm, tex_mr, tex_em],
                             area_light=light)


def _cam():
    return Camera(eye=(0, 1.5, -4.5), lookat=(0, 0.6, 0), up=(0, 1, 0),
                  fov_y=45.0, aspect=1.0).params()


def _compare(scene, max_depth=2):
    cam = _cam()
    ref, rays_e = render_sample(scene, cam, W, H, 0, max_depth=max_depth,
                                chunk_size=None)
    out, rays_f = render_sum_fused(scene, cam, W, H, 0,
                                   samples_per_launch=1,
                                   max_depth=max_depth, interpret=True)
    return (np.asarray(ref), np.asarray(out), float(rays_e), float(rays_f))


class TestFusedTextures:
    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_all_maps_exact_f32(self, monkeypatch):
        """Under f32 filtering the kernel must match the engine exactly
        (the folded bilinear weights only reassociate the lerp)."""
        monkeypatch.setenv("ORT_TEX_F32", "1")
        ref, out, re_, rf_ = _compare(_textured_scene())
        assert re_ == rf_
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_all_maps_bf16_close(self):
        """Default bf16 filtering: continuous noise only at depth 2 except
        where a normal-mapped bounce direction flips a secondary hit —
        bounded count of outlier pixels, near-identical ray counts."""
        ref, out, re_, rf_ = _compare(_textured_scene())
        assert abs(re_ - rf_) <= 8, (re_, rf_)
        diff = np.abs(out - ref)
        assert diff.mean() < 3e-3
        assert (diff.max(axis=-1) > 0.05).mean() < 0.01

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_base_map_only_exact_f32(self, monkeypatch):
        monkeypatch.setenv("ORT_TEX_F32", "1")
        ref, out, re_, rf_ = _compare(_textured_scene(maps="base"))
        assert re_ == rf_
        np.testing.assert_allclose(out, ref, atol=1e-3)

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_smooth_textured_exact_f32(self, monkeypatch):
        monkeypatch.setenv("ORT_TEX_F32", "1")
        ref, out, re_, rf_ = _compare(_textured_scene(smooth=True))
        assert re_ == rf_
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_smooth_untextured_exact(self):
        """Smooth-mesh shading normals interpolate in-kernel — closes the
        fused path's flat-normal gap for smooth meshes (LocalGeometry.h
        barycentric N interpolation)."""
        s = 3.0
        verts = np.array([[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s],
                          [-1, 0, -0.5], [1, 0, -0.5],
                          [1, 1.6, -0.5], [-1, 1.6, -0.5]], np.float32)
        idx = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7]],
                       np.int32)
        normals = np.zeros((8, 3), np.float32)
        normals[:4] = (0, 1, 0)
        nr = np.array([0.3, 0.2, -0.93], np.float32)
        normals[4:] = nr / np.linalg.norm(nr)
        light = ParallelogramLight.make((-1.0, 3.0, -1.0), (2, 0, 0),
                                        (0, 0, 2), (8.0, 8.0, 8.0))
        scene = make_device_scene(
            verts, idx, np.zeros(4, np.int32),
            [{"kind": mat.DIFFUSE, "base_color": (0.7, 0.5, 0.4)}],
            normals=normals, area_light=light)
        ref, out, re_, rf_ = _compare(scene)
        assert re_ == rf_
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_use_fused_gating(self, monkeypatch):
        """Textured scenes default to the XLA wavefront (the in-kernel
        texture unit measured SLOWER on hardware — 18.1 vs 22.9 Mrays/s,
        round 4); ORT_FUSED_TEX=1 opts back into the megakernel within
        its static budgets, and meshes past the SMEM budget fall back to
        the engine + cluster path regardless."""
        from optix_raytracer_tpu.accel import bruteforce as bf
        from optix_raytracer_tpu.accel.pallas_bf import MAX_SMEM_TRIS
        from optix_raytracer_tpu.wavefront.engine import _use_fused
        monkeypatch.setattr(bf, "_TPU_PLATFORMS", ("cpu", "tpu", "axon"))
        scene = _textured_scene()
        assert tex_static(scene) is not None
        assert not _use_fused(scene, "auto")   # XLA is the textured default
        monkeypatch.setenv("ORT_FUSED_TEX", "1")
        assert _use_fused(scene, "auto")

        def make_n(n):
            rng = np.random.default_rng(0)
            verts = rng.normal(0, 1, (3 * n, 3)).astype(np.float32)
            idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
            uvs = rng.uniform(0, 1, (3 * n, 2)).astype(np.float32)
            tex = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
            return make_device_scene(
                verts, idx, np.zeros(n, np.int32),
                [{"kind": mat.DIFFUSE, "base_color": (1, 1, 1),
                  "base_tex": 0}], uvs=uvs, textures=[tex])

        assert _use_fused(make_n(TEX_MAX_TRIS + 8), "auto")   # one-hot path
        assert not _use_fused(make_n(MAX_SMEM_TRIS + 8), "auto")

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_onehot_winner_fetch_exact_f32(self, monkeypatch):
        """Past the unroll budget the winner attributes come from the
        one-hot MXU fetch — still engine-exact under f32 filtering."""
        monkeypatch.setenv("ORT_TEX_F32", "1")
        rng = np.random.default_rng(1)
        n = TEX_MAX_TRIS + 40
        # a jittered triangle fan around the light so hits are plentiful
        ang = np.linspace(0, 2 * np.pi, n + 1)
        verts = []
        idx = []
        for i in range(n):
            a0, a1 = ang[i], ang[i + 1]
            verts += [[0, 0, 0],
                      [2 * np.cos(a0), 0.1 * rng.uniform(), 2 * np.sin(a0)],
                      [2 * np.cos(a1), 0.1 * rng.uniform(), 2 * np.sin(a1)]]
            idx.append([3 * i, 3 * i + 1, 3 * i + 2])
        verts = np.asarray(verts, np.float32)
        idx = np.asarray(idx, np.int32)
        uvs = rng.uniform(0, 2, (3 * n, 2)).astype(np.float32)
        tex = rng.uniform(0.1, 0.9, (16, 16, 3)).astype(np.float32)
        light = ParallelogramLight.make((-1.0, 3.0, -1.0), (2, 0, 0),
                                        (0, 0, 2), (8.0, 8.0, 8.0))
        scene = make_device_scene(
            verts, idx, np.zeros(n, np.int32),
            [{"kind": mat.DIFFUSE, "base_color": (1, 1, 1),
              "base_tex": 0}], uvs=uvs, textures=[tex], area_light=light)
        cam = Camera(eye=(0, 2.5, -4.0), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y=50.0, aspect=1.0).params()
        ref, re_ = render_sample(scene, cam, W, H, 0, max_depth=2,
                                 chunk_size=None)
        out, rf_ = render_sum_fused(scene, cam, W, H, 0,
                                    samples_per_launch=1, max_depth=2,
                                    interpret=True)
        assert float(re_) == float(rf_)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3)

    @pytest.mark.slow  # heavy parity sweep (default run keeps a cheap cousin)
    def test_regen_with_textures_bit_equal(self):
        """Path regeneration must stay bit-compatible with the lock-step
        schedule when the state tuple carries path_len (ray-cone LOD)."""
        scene = _textured_scene()
        cam = _cam()
        lock, cl = render_sum_fused(scene, cam, W, H, 3,
                                    samples_per_launch=2, max_depth=2,
                                    interpret=True, regen=False)
        reg, cr = render_sum_fused(scene, cam, W, H, 3,
                                   samples_per_launch=2, max_depth=2,
                                   interpret=True, regen=True)
        assert float(cl) == float(cr)
        np.testing.assert_allclose(np.asarray(reg), np.asarray(lock),
                                   atol=1e-6)
