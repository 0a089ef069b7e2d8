"""Interleaved row distribution + sharded texture memory."""
import jax
import numpy as np
import pytest

from optix_raytracer_tpu.core import film as film_mod
from optix_raytracer_tpu.multichip import memory, tiles
from optix_raytracer_tpu.scene.builtins import cornell_box, cornell_camera
from optix_raytracer_tpu.wavefront.engine import render_accumulate


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


class TestInterleaved:
    def test_matches_single_chip_after_deinterleave(self, scene):
        w = h = 32
        cam = cornell_camera(w, h).params()
        ref, _ = render_accumulate(scene, cam, film_mod.Film.create(h, w),
                                   w, h, samples_per_launch=2, max_depth=2,
                                   chunk_size=None)
        mesh = tiles.make_mesh(n_rows=8, n_samples=1,
                               devices=jax.devices()[:8])
        film = tiles.shard_film(film_mod.Film.create(h, w), mesh)
        film = tiles.render_accumulate_interleaved(
            scene, cam, film, mesh, w, h, samples_per_launch=2, max_depth=2)
        out = tiles.deinterleave_rows(np.asarray(film.accum), 8)
        np.testing.assert_allclose(out, np.asarray(ref.accum),
                                   rtol=1e-5, atol=1e-5)

    def test_deinterleave_permutation(self):
        acc = np.arange(8 * 2 * 1 * 1).reshape(8 * 2, 1, 1).astype(np.float32)
        # shard r holds rows [r, r+8] of the global image at local 0,1
        out = tiles.deinterleave_rows(acc, 8)
        # global row g = shard g%8, local g//8 → out[g] = acc[(g%8)*2 + g//8]
        for g in range(16):
            assert out[g, 0, 0] == acc[(g % 8) * 2 + g // 8, 0, 0]


class TestShardedTextures:
    def test_sharded_textures_render_matches(self, tmp_path):
        from test_scene_gltf import make_cube_gltf
        from optix_raytracer_tpu.scene.scene import Scene
        from optix_raytracer_tpu.shade.lights import AMBIENT, DIRECTIONAL
        path = make_cube_gltf(str(tmp_path / "cube.gltf"))
        host = Scene.load(path)
        lights = [{"kind": DIRECTIONAL, "direction": (-0.4, -0.7, -0.6),
                   "color": (0.9, 0.9, 0.9)},
                  {"kind": AMBIENT, "color": (0.25, 0.25, 0.25)}]
        ds = host.finalize(lights=lights)
        cam = host.default_camera(32, 32).params()
        from optix_raytracer_tpu.wavefront.whitted import render_whitted_sample
        ref = np.asarray(render_whitted_sample(ds, cam, 32, 32, 0,
                                               max_depth=2))
        mesh = tiles.make_mesh(n_rows=8, n_samples=1,
                               devices=jax.devices()[:8])
        ds_sharded = memory.shard_scene_textures(ds, mesh)
        out = np.asarray(render_whitted_sample(ds_sharded, cam, 32, 32, 0,
                                               max_depth=2))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


class TestMultiSlice:
    """Multi-host (DCN) mesh: (slice, rows, samples) — row bands across
    slices, sample pmean intra-slice, no rendering collective on the DCN
    axis. Must equal the single-chip accumulate exactly."""

    def test_multislice_matches_single_chip(self):
        import jax
        import numpy as np
        import jax.numpy as jnp
        from optix_raytracer_tpu.core import film as film_mod
        from optix_raytracer_tpu.multichip import multislice as ms
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        from optix_raytracer_tpu.wavefront.engine import render_accumulate

        w, h = 16, 32
        scene = cornell_box()
        cam = cornell_camera(w, h).params()

        mesh = ms.make_multislice_mesh(2, 2, 2,
                                       devices=jax.devices()[:8])
        film = ms.shard_film(film_mod.Film.create(h, w), mesh)
        film = ms.render_accumulate_multislice(
            scene, cam, film, mesh, w, h, samples_per_launch=1, max_depth=2)
        assert int(film.subframe) == 2

        ref = film_mod.Film.create(h, w)
        for _ in range(2):
            ref, _ = render_accumulate(scene, cam, ref, w, h,
                                       samples_per_launch=1, max_depth=2,
                                       chunk_size=None)
        np.testing.assert_allclose(np.asarray(film.accum),
                                   np.asarray(ref.accum), atol=2e-5)
