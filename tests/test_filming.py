"""Camera ray generation and film splat tests."""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm
from arendur_tpu.sampling import filters as filt


def cornell_camera(resx=1024, resy=768):
    # ref: examples/cornellbox/cb.json camera block
    return cam.make_perspective(
        parent_view=np.eye(4, dtype=np.float32),
        screen_min=(-1.0, -0.75), screen_max=(1.0, 0.7),
        znear=0.1, zfar=1000.0, fov=1.2707964, lens=None,
        resolution=(resx, resy))


class TestPerspective:
    def test_rays_unit_and_forward(self):
        c = cornell_camera()
        pf = jnp.asarray([[512.0, 384.0], [0.5, 0.5], [1023.5, 767.5]],
                         jnp.float32)
        pl = jnp.full((3, 2), 0.5, jnp.float32)
        o, d = cam.generate_rays(c, pf, pl)
        np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
        assert (np.asarray(d)[:, 2] > 0).all()  # looking down +z

    def test_raster_to_screen_mapping(self):
        c = cornell_camera()
        # raster (0,0) is the screen's (pmin.x, pmax.y) corner:
        # upper-left. Its direction must have negative x... screen
        # x=-1 => view x negative; screen y=+0.7 => view y positive.
        pf = jnp.asarray([[0.0, 0.0]], jnp.float32)
        pl = jnp.full((1, 2), 0.5, jnp.float32)
        _, d = cam.generate_rays(c, pf, pl)
        d = np.asarray(d)[0]
        assert d[0] < 0 and d[1] > 0

    def test_center_through_screen_center(self):
        c = cornell_camera()
        # screen center (0, -0.025) maps to raster center
        pf = jnp.asarray([[512.0, 384.0]], jnp.float32)
        pl = jnp.full((1, 2), 0.5, jnp.float32)
        _, d = cam.generate_rays(c, pf, pl)
        d = np.asarray(d)[0]
        # x should be ~0; y slightly negative (screen center y=-0.025)
        assert abs(d[0]) < 1e-4
        assert d[1] < 0

    def test_differentials_close(self):
        c = cornell_camera()
        pf = jnp.asarray([[100.0, 100.0]], jnp.float32)
        pl = jnp.full((1, 2), 0.5, jnp.float32)
        o, d, rxd, ryd = cam.generate_ray_differentials(c, pf, pl)
        _, d1 = cam.generate_rays(
            c, jnp.asarray([[101.0, 100.0]], jnp.float32), pl)
        np.testing.assert_allclose(
            np.asarray(rxd)[0], np.asarray(d1)[0], atol=1e-4)


class TestFilm:
    def test_box_filter_single_pixel(self):
        cfg = flm.FilmConfig(resolution=(8, 8),
                             filter=filt.FilterSpec("box", (0.5, 0.5)))
        st = flm.film_init(cfg)
        pf = jnp.asarray([[3.5, 4.5]], jnp.float32)  # center of pixel (3,4)
        L = jnp.asarray([[2.0, 4.0, 8.0]], jnp.float32)
        st = flm.film_splat(cfg, st, pf, L)
        img = np.asarray(flm.film_finalize(st, cfg))
        np.testing.assert_allclose(img[4, 3], [2, 4, 8], rtol=1e-5)
        assert np.abs(img).sum() == np.abs(img[4, 3]).sum()

    def test_energy_conservation_triangle(self):
        cfg = flm.FilmConfig(resolution=(16, 16),
                             filter=filt.FilterSpec("triangle", (2.0, 2.0)))
        st = flm.film_init(cfg)
        rng = np.random.default_rng(0)
        pf = jnp.asarray(
            rng.uniform(4, 12, (64, 2)).astype(np.float32))
        L = jnp.ones((64, 3), jnp.float32)
        st = flm.film_splat(cfg, st, pf, L)
        img = np.asarray(flm.film_finalize(st, cfg))
        # constant input -> constant output wherever weight > 0
        w = np.asarray(st.weight).reshape(16, 16)
        np.testing.assert_allclose(img[w > 0], 1.0, rtol=1e-4)

    def test_mask(self):
        cfg = flm.FilmConfig(resolution=(4, 4),
                             filter=filt.FilterSpec("box", (0.5, 0.5)))
        st = flm.film_init(cfg)
        pf = jnp.asarray([[1.5, 1.5], [2.5, 2.5]], jnp.float32)
        L = jnp.ones((2, 3), jnp.float32)
        st = flm.film_splat(cfg, st, pf, L,
                            mask=jnp.asarray([True, False]))
        img = np.asarray(flm.film_finalize(st, cfg))
        assert img[1, 1].sum() > 0 and img[2, 2].sum() == 0

    def test_crop_window(self):
        cfg = flm.FilmConfig(resolution=(8, 8),
                             filter=filt.FilterSpec("box", (0.5, 0.5)),
                             crop_min=(2, 2), crop_max=(6, 6))
        st = flm.film_init(cfg)
        pf = jnp.asarray([[1.0, 1.0], [3.0, 3.0]], jnp.float32)
        L = jnp.ones((2, 3), jnp.float32)
        st = flm.film_splat(cfg, st, pf, L)
        img = np.asarray(flm.film_finalize(st, cfg))
        assert img[1, 1].sum() == 0  # outside crop rejected
        assert img[3, 3].sum() > 0


class TestPixmajorSplat:
    """film_splat_pixmajor must agree with the generic scatter splat."""

    def _run(self, kind, radius, res=(16, 12), spp=4, mask_frac=None,
             waves=1, crop=None):
        rng = np.random.default_rng(42)
        w, h = res
        kw = dict(crop_min=crop[0], crop_max=crop[1]) if crop else {}
        cfg = flm.FilmConfig(resolution=res,
                             filter=filt.FilterSpec(kind, radius), **kw)
        total = w * h * spp
        jitter = rng.random((total, 2)).astype(np.float32)
        L = rng.random((total, 3)).astype(np.float32)
        pix = np.arange(total) // spp
        pfilm = np.stack([pix % w, pix // w], -1).astype(np.float32) + jitter
        mask = None
        if mask_frac is not None:
            mask = rng.random(total) < mask_frac

        st_ref = flm.film_init(cfg)
        st_ref = flm.film_splat(cfg, st_ref, jnp.asarray(pfilm),
                                jnp.asarray(L),
                                None if mask is None else jnp.asarray(mask))
        ref = np.asarray(flm.film_finalize(st_ref, cfg))

        st = flm.film_init(cfg, padded=True)
        nw = total // waves
        for i in range(waves):
            sl = slice(i * nw, (i + 1) * nw)
            st = flm.film_splat_pixmajor(
                cfg, st, jnp.asarray(jitter[sl]), jnp.asarray(L[sl]),
                jnp.int32(i * nw // spp), spp,
                None if mask is None else jnp.asarray(mask[sl]))
        out = np.asarray(flm.film_finalize(st, cfg))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_lanczos4(self):
        self._run("lanczos", (4.0, 4.0))

    def test_mitchell2(self):
        self._run("mitchell", (2.0, 2.0))

    def test_gaussian_masked_multiwave(self):
        self._run("gaussian", (1.5, 1.5), mask_frac=0.7, waves=4)

    def test_box(self):
        self._run("box", (0.5, 0.5))

    def test_crop_window(self):
        self._run("lanczos", (4.0, 4.0), crop=((2, 3), (13, 10)))
