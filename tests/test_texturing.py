"""Texture atlas: mipmaps, wrap modes, bilinear/trilinear lookups."""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.texturing import texture as tx


def checkerboard(n=8):
    img = np.indices((n, n)).sum(0) % 2
    return np.repeat(img[..., None].astype(np.float32), 3, -1)


class TestAtlas:
    def test_mipchain_means(self):
        b = tx.AtlasBuilder()
        tid = b.add_image(checkerboard(8))
        atlas = b.build()
        assert int(atlas.n_levels[tid]) == 4  # 8,4,2,1
        # top level texel = global mean = 0.5
        top_off = int(atlas.offset[tid, 3])
        np.testing.assert_allclose(
            np.asarray(atlas.texels[top_off]), 0.5, atol=1e-6)

    def test_point_lookup(self):
        b = tx.AtlasBuilder()
        img = np.zeros((4, 4, 3), np.float32)
        img[1, 2] = [1.0, 0.5, 0.25]
        tid = b.add_image(img)
        atlas = b.build()
        # center of texel (x=2, y=1): u=(2+.5)/4, v=(1+.5)/4
        uv = jnp.asarray([[2.5 / 4, 1.5 / 4]], jnp.float32)
        out = np.asarray(tx.sample_texture(
            atlas, jnp.asarray([tid], jnp.int32), uv))[0]
        np.testing.assert_allclose(out, [1.0, 0.5, 0.25], atol=1e-6)

    def test_wrap_modes(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = 1.0
        for mode, expect_zero in ((tx.WRAP_REPEAT, False),
                                  (tx.WRAP_BLACK, True)):
            b = tx.AtlasBuilder()
            tid = b.add_image(img, wrap=mode)
            atlas = b.build()
            uv = jnp.asarray([[1.25, 0.25]], jnp.float32)  # u out of [0,1)
            out = np.asarray(tx.sample_texture(
                atlas, jnp.asarray([tid], jnp.int32), uv))[0]
            if expect_zero:
                # bilinear stencil at u=1.25 touches out-of-range texels
                assert out.max() <= 1.0
            else:
                assert out.max() > 0.0

    def test_trilinear_blend(self):
        b = tx.AtlasBuilder()
        tid = b.add_image(checkerboard(8))
        atlas = b.build()
        ids = jnp.asarray([tid], jnp.int32)
        uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
        lo = np.asarray(tx.sample_texture(
            atlas, ids, uv, lod=jnp.asarray([0.0])))[0]
        hi = np.asarray(tx.sample_texture(
            atlas, ids, uv, lod=jnp.asarray([3.0])))[0]
        np.testing.assert_allclose(hi, 0.5, atol=1e-5)
        mid = np.asarray(tx.sample_texture(
            atlas, ids, uv, lod=jnp.asarray([2.5])))[0]
        assert (mid >= np.minimum(lo, hi) - 1e-5).all()

    def test_eval_rgb_fallback(self):
        b = tx.AtlasBuilder()
        tid = b.add_image(np.ones((2, 2, 3), np.float32))
        atlas = b.build()
        tex_id = jnp.asarray([tid, -1], jnp.int32)
        uv = jnp.full((2, 2), 0.5, jnp.float32)
        fallback = jnp.asarray([[0.1, 0.2, 0.3]] * 2, jnp.float32)
        out = np.asarray(tx.eval_rgb(atlas, tex_id, uv, fallback))
        np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[1], [0.1, 0.2, 0.3], atol=1e-6)

    def test_gamma_decode(self):
        b = tx.AtlasBuilder()
        tid = b.add_image(np.full((2, 2, 3), 0.5, np.float32), gamma=True)
        atlas = b.build()
        out = np.asarray(tx.sample_texture(
            atlas, jnp.asarray([tid], jnp.int32),
            jnp.asarray([[0.5, 0.5]], jnp.float32)))[0]
        np.testing.assert_allclose(out, 0.2140, atol=1e-3)
