"""Sobol sampler: low discrepancy + integrator integration."""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.sampling import sobol, sampler as smp


class TestSobol:
    def test_table_and_uniformity(self):
        table = sobol.build_sobol_table(64, 8)
        assert table.shape == (64, 8)
        key = smp.make_base_key(0)
        pix = jnp.zeros(64, jnp.int32)
        sid = jnp.arange(64, dtype=jnp.int32)
        u = np.asarray(sobol.sobol_uniform(table, key, pix, sid, 3))
        assert (u >= 0).all() and (u < 1).all()
        # stratification: every 1/64 stratum hit exactly once on the
        # base sequence (scramble is a fixed XOR per (pixel,dim), which
        # permutes strata bijectively)
        strata = np.sort((u * 64).astype(int))
        assert len(np.unique(strata)) == 64

    def test_pixels_decorrelated(self):
        table = sobol.build_sobol_table(16, 4)
        key = smp.make_base_key(0)
        sid = jnp.arange(16, dtype=jnp.int32)
        u_a = np.asarray(sobol.sobol_uniform(
            table, key, jnp.zeros(16, jnp.int32), sid, 2))
        u_b = np.asarray(sobol.sobol_uniform(
            table, key, jnp.ones(16, jnp.int32), sid, 2))
        assert not np.allclose(u_a, u_b)

    def test_lower_variance_than_random(self):
        """Sobol integrates smooth f with lower error than iid random."""
        table = sobol.build_sobol_table(256, 2)
        key = smp.make_base_key(1)
        pix = jnp.zeros(256, jnp.int32)
        sid = jnp.arange(256, dtype=jnp.int32)
        u = np.asarray(sobol.sobol_uniform_2d(table, key, pix, sid, 0))
        f_sobol = np.mean(np.sin(np.pi * u[:, 0]) * np.sin(np.pi * u[:, 1]))
        truth = (2 / np.pi) ** 2
        err_sobol = abs(f_sobol - truth)
        errs_rand = []
        rng = np.random.default_rng(0)
        for _ in range(20):
            r = rng.uniform(size=(256, 2))
            errs_rand.append(abs(np.mean(
                np.sin(np.pi * r[:, 0]) * np.sin(np.pi * r[:, 1])) - truth))
        assert err_sobol < np.median(errs_rand)

    def test_integrator_runs_with_sobol(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_integrator import plane_scene, look_down_camera
        from arendur_tpu.render import integrator as integ
        from arendur_tpu.filming import film as flm
        from arendur_tpu.sampling import filters as filt
        scene = plane_scene()
        camera = look_down_camera(res=8)
        film_cfg = flm.FilmConfig(
            resolution=(8, 8), filter=filt.FilterSpec("box", (0.5, 0.5)))
        spp = 16
        table = sobol.build_sobol_table(spp, 80)
        config = integ.RenderConfig(
            max_depth=1, spp=spp, sample_dx=4, sample_dy=4,
            wave_size=8 * 8 * spp, sampler="sobol", sobol_table=table)
        img = np.asarray(integ.render(scene, camera, film_cfg, config))
        expected = 0.6 / np.pi * 10.0 / 4.0
        got = img[3:5, 3:5].mean()
        np.testing.assert_allclose(got, expected, rtol=0.1)
