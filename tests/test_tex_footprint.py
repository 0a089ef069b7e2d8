"""Texture footprint intrinsics (optixTexFootprint2D{,Lod,Grad} parity,
`optix_device.h:1551-1591`): mip choice, texel rect, single-vs-two-level
flag — the demand-loading primitive of the reference's sparse textures."""
import numpy as np
import jax.numpy as jnp

from optix_raytracer_tpu.scene.device_scene import pack_textures
from optix_raytracer_tpu.shade import texture as tx


def _table(size=64):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    tex, tex_size, tex_mip = pack_textures([img])
    return tex, tex_size, tex_mip


class TestFootprintLod:
    def test_integral_lod_single_level(self):
        _, _, mips = _table(64)
        uv = jnp.asarray([[0.5, 0.5]])
        fp = tx.tex_footprint_2d_lod(mips, jnp.asarray([0]), uv,
                                     jnp.asarray([2.0]))
        assert int(fp["level"][0]) == 2
        assert bool(fp["single_mip"][0])
        # a centered bilinear tap at a 16x16 level touches 2x2 texels
        np.testing.assert_array_equal(np.asarray(fp["size"][0]), [2, 2])
        np.testing.assert_array_equal(np.asarray(fp["level_dim"][0]),
                                      [16, 16])

    def test_fractional_lod_two_levels_coarse_flag(self):
        _, _, mips = _table(64)
        uv = jnp.asarray([[0.25, 0.75]])
        tid = jnp.asarray([0])
        lod = jnp.asarray([1.5])
        fine = tx.tex_footprint_2d_lod(mips, tid, uv, lod, coarse=False)
        coarse = tx.tex_footprint_2d_lod(mips, tid, uv, lod, coarse=True)
        assert not bool(fine["single_mip"][0])
        assert int(fine["level"][0]) == 1
        assert int(coarse["level"][0]) == 2

    def test_lod_clamped_to_chain(self):
        _, _, mips = _table(32)   # chain 32,16,8,4,2,1 -> 6 levels
        fp = tx.tex_footprint_2d_lod(mips, jnp.asarray([0]),
                                     jnp.asarray([[0.5, 0.5]]),
                                     jnp.asarray([99.0]))
        assert int(fp["level"][0]) == 5
        np.testing.assert_array_equal(np.asarray(fp["level_dim"][0]),
                                      [1, 1])

    def test_rect_wraps(self):
        _, _, mips = _table(64)
        # uv near 0 -> bilinear support wraps to the far edge
        fp = tx.tex_footprint_2d_lod(mips, jnp.asarray([0]),
                                     jnp.asarray([[0.001, 0.001]]),
                                     jnp.asarray([0.0]))
        np.testing.assert_array_equal(np.asarray(fp["lo"][0]), [63, 63])
        np.testing.assert_array_equal(np.asarray(fp["size"][0]), [2, 2])


class TestFootprintGrad:
    def test_grad_lod_matches_trilinear_rule(self):
        _, _, mips = _table(64)
        uv = jnp.asarray([[0.5, 0.5]])
        tid = jnp.asarray([0])
        # 4-texel-wide gradient at level 0 -> lod 2
        g = jnp.asarray([[4.0 / 64.0, 0.0]])
        z = jnp.zeros_like(g)
        fp = tx.tex_footprint_2d_grad(mips, tid, uv, g, z)
        assert int(fp["level"][0]) == 2
        # the rect at the chosen level covers the gradient extent
        assert int(fp["size"][0, 0]) >= 2

    def test_zero_grad_is_level0_bilinear(self):
        _, _, mips = _table(64)
        z = jnp.zeros((1, 2))
        fp = tx.tex_footprint_2d_grad(mips, jnp.asarray([0]),
                                      jnp.asarray([[0.5, 0.5]]), z, z)
        assert int(fp["level"][0]) == 0
        np.testing.assert_array_equal(np.asarray(fp["size"][0]), [2, 2])

    def test_footprint_covers_sampled_texels(self):
        """Every texel trilinear actually reads lies inside the reported
        rect (the contract demand-loading relies on)."""
        _, _, mips = _table(32)
        rng = np.random.default_rng(1)
        uv = jnp.asarray(rng.uniform(0.1, 0.9, (64, 2)).astype(np.float32))
        tid = jnp.zeros(64, jnp.int32)
        fp = tx.tex_footprint_2d_lod(mips, tid, uv, jnp.zeros(64))
        lo = np.asarray(fp["lo"])
        size = np.asarray(fp["size"])
        dim = np.asarray(fp["level_dim"])
        # level-0 bilinear taps: floor(uv*d - .5) and +1
        fx = np.asarray(uv[:, 0]) * dim[:, 0] - 0.5
        fy = np.asarray(uv[:, 1]) * dim[:, 1] - 0.5
        for tap_x in (np.floor(fx), np.floor(fx) + 1):
            rel = (tap_x - lo[:, 0]) % dim[:, 0]
            assert (rel < size[:, 0]).all()
        for tap_y in (np.floor(fy), np.floor(fy) + 1):
            rel = (tap_y - lo[:, 1]) % dim[:, 1]
            assert (rel < size[:, 1]).all()


class TestFootprintImplicit:
    def test_texel_scale_drives_level(self):
        _, _, mips = _table(64)
        uv = jnp.asarray([[0.5, 0.5]])
        tid = jnp.asarray([0])
        fp0 = tx.tex_footprint_2d(mips, tid, uv)
        assert int(fp0["level"][0]) == 0
        fp = tx.tex_footprint_2d(mips, tid, uv,
                                 texel_scale=jnp.asarray([8.0 / 64.0]))
        assert int(fp["level"][0]) == 3
