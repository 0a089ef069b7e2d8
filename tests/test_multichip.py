"""Multi-chip sharded rendering must match the single-chip render exactly —
the SURVEY.md §4 implication: "run the same scene on 1 vs N devices and assert
identical framebuffers". Runs on the 8-virtual-device CPU mesh."""
import jax
import numpy as np
import pytest

from optix_raytracer_tpu.core import film as film_mod
from optix_raytracer_tpu.multichip import tiles
from optix_raytracer_tpu.scene.builtins import cornell_box, cornell_camera
from optix_raytracer_tpu.wavefront.engine import render_accumulate


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def single_chip(scene, w, h, samples, depth=2):
    film = film_mod.Film.create(h, w)
    cam = cornell_camera(w, h).params()
    film, _ = render_accumulate(scene, cam, film, w, h,
                                samples_per_launch=samples, max_depth=depth,
                                chunk_size=None)
    return np.asarray(film.accum)


def multi_chip(scene, w, h, samples, n_rows, n_samples, depth=2):
    mesh = tiles.make_mesh(n_rows=n_rows, n_samples=n_samples,
                           devices=jax.devices()[: n_rows * n_samples])
    cam = cornell_camera(w, h).params()
    film = tiles.shard_film(film_mod.Film.create(h, w), mesh)
    assert samples % n_samples == 0
    film = tiles.render_accumulate_sharded(
        scene, cam, film, mesh, w, h,
        samples_per_launch=samples // n_samples, max_depth=depth)
    assert int(film.subframe) == samples
    return np.asarray(film.accum)


class TestShardedRender:
    def test_requires_8_devices(self):
        assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"

    def test_rows_sharded_matches_single(self, scene):
        w = h = 32
        ref = single_chip(scene, w, h, samples=4)
        out = multi_chip(scene, w, h, samples=4, n_rows=8, n_samples=1)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_rows_x_samples_mesh_matches_single(self, scene):
        w = h = 32
        ref = single_chip(scene, w, h, samples=4)
        out = multi_chip(scene, w, h, samples=4, n_rows=4, n_samples=2)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_sample_parallel_only(self, scene):
        w = h = 16
        ref = single_chip(scene, w, h, samples=8)
        out = multi_chip(scene, w, h, samples=8, n_rows=1, n_samples=8)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_progressive_across_launches(self, scene):
        w = h = 16
        mesh = tiles.make_mesh(n_rows=4, n_samples=2,
                               devices=jax.devices()[:8])
        cam = cornell_camera(w, h).params()
        film = tiles.shard_film(film_mod.Film.create(h, w), mesh)
        for _ in range(2):
            film = tiles.render_accumulate_sharded(
                scene, cam, film, mesh, w, h, samples_per_launch=2,
                max_depth=2)
        ref = single_chip(scene, w, h, samples=8)
        np.testing.assert_allclose(np.asarray(film.accum), ref,
                                   rtol=1e-5, atol=1e-5)
