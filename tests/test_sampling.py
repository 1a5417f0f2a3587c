"""Tests for warps, MIS heuristics, distributions, filters, sampler."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arendur_tpu.sampling import warps, distribution, filters, sampler


def uniforms(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))


class TestWarps:
    def test_unit_norm(self):
        u = uniforms(512)
        for f in (warps.sample_uniform_sphere,
                  warps.sample_cosw_hemisphere):
            w = np.asarray(f(u))
            np.testing.assert_allclose(
                np.linalg.norm(w, axis=-1), 1.0, atol=1e-4)

    def test_cosw_hemisphere_mean(self):
        # E[cos theta] under p = cos/pi is 2/3
        u = uniforms(200_000, 1)
        w = np.asarray(warps.sample_cosw_hemisphere(u))
        assert w[:, 2].min() >= 0.0
        np.testing.assert_allclose(w[:, 2].mean(), 2.0 / 3.0, atol=5e-3)

    def test_concentric_disk_in_disk(self):
        u = uniforms(4096, 2)
        d = np.asarray(warps.sample_concentric_disk(u))
        assert (np.linalg.norm(d, axis=-1) <= 1.0 + 1e-5).all()
        # area uniformity: fraction inside r=0.5 disk is 1/4
        frac = (np.linalg.norm(d, axis=-1) < 0.5).mean()
        np.testing.assert_allclose(frac, 0.25, atol=0.02)

    def test_triangle_barycentric(self):
        u = uniforms(1024, 3)
        b = np.asarray(warps.sample_uniform_triangle(u))
        assert (b >= -1e-6).all()
        np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)

    def test_power_heuristic(self):
        w = float(warps.power_heuristic(1, 2.0, 1, 1.0))
        np.testing.assert_allclose(w, 4.0 / 5.0, rtol=1e-6)


class TestDistribution1D:
    def test_discrete_matches_weights(self):
        f = [1.0, 3.0, 0.0, 4.0]
        d = distribution.build_distribution_1d(f)
        u = jnp.asarray(
            np.random.default_rng(0).uniform(size=100_000).astype(np.float32))
        idx, pdf = distribution.sample_discrete(d, u)
        idx = np.asarray(idx)
        counts = np.bincount(idx, minlength=4) / len(idx)
        np.testing.assert_allclose(counts, [1 / 8, 3 / 8, 0, 4 / 8], atol=5e-3)
        # pdf must agree with empirical frequency
        np.testing.assert_allclose(
            np.asarray(pdf)[idx == 1], 3 / 8, rtol=1e-5)

    def test_uniform_fallback(self):
        d = distribution.build_distribution_1d([0.0, 0.0])
        idx, pdf = distribution.sample_discrete(
            d, jnp.asarray([0.1, 0.9], jnp.float32))
        np.testing.assert_allclose(np.asarray(pdf), 0.5)
        assert list(np.asarray(idx)) == [0, 1]

    def test_continuous(self):
        d = distribution.build_distribution_1d([1.0, 3.0])
        u = jnp.asarray(
            np.random.default_rng(1).uniform(size=50_000).astype(np.float32))
        x, pdf, _ = distribution.sample_continuous(d, u)
        x = np.asarray(x)
        frac_hi = (x > 0.5).mean()
        np.testing.assert_allclose(frac_hi, 0.75, atol=5e-3)
        np.testing.assert_allclose(np.asarray(pdf)[x > 0.5], 1.5, rtol=1e-5)


class TestFilters:
    def test_box(self):
        (rx, ry), f = filters.make_filter(filters.FilterSpec("box", (1, 1)))
        assert float(f(jnp.zeros((1, 2)))[0]) == 1.0

    def test_lanczos_center_and_zero(self):
        _, f = filters.make_filter(filters.DEFAULT_FILTER)
        assert abs(float(f(jnp.zeros((1, 2)))[0]) - 1.0) < 1e-5
        # integer offsets hit sinc zeros
        v = float(f(jnp.asarray([[2.0, 0.0]]))[0])
        assert abs(v) < 1e-5

    def test_mitchell_partition(self):
        _, f = filters.make_filter(
            filters.FilterSpec("mitchell", (2.0, 2.0)))
        assert abs(float(f(jnp.zeros((1, 2)))[0])) > 0.1


class TestSampler:
    def test_deterministic_and_decorrelated(self):
        key = sampler.make_base_key(0)
        pix = jnp.arange(128, dtype=jnp.int32)
        sid = jnp.zeros(128, jnp.int32)
        ks = sampler.ray_keys(key, pix, sid)
        u1 = sampler.uniform_1d(ks, 0)
        u1b = sampler.uniform_1d(ks, 0)
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u1b))
        u2 = sampler.uniform_1d(ks, 1)
        assert not np.allclose(np.asarray(u1), np.asarray(u2))
        assert np.asarray(u1).std() > 0.2

    def test_stratified_film(self):
        key = sampler.make_base_key(0)
        n = 16
        pix = jnp.zeros(n, jnp.int32)
        sid = jnp.arange(n, dtype=jnp.int32)
        ks = sampler.ray_keys(key, pix, sid)
        p = np.asarray(sampler.stratified_film_sample(ks, sid, 4, 4))
        # each of the 16 strata is hit exactly once
        cells = set(zip((p[:, 0] * 4).astype(int), (p[:, 1] * 4).astype(int)))
        assert len(cells) == 16


class TestDistribution2D:
    def test_sampling_matches_density(self):
        from arendur_tpu.sampling import distribution as dist
        rng = np.random.default_rng(3)
        f = np.asarray([[1.0, 0.0, 3.0, 0.0],
                        [0.0, 2.0, 0.0, 2.0],
                        [4.0, 0.0, 0.0, 0.0]], np.float32)
        d = dist.build_distribution_2d(f)
        u = jnp.asarray(rng.random((20000, 2)), jnp.float32)
        xy, pdf = dist.sample_continuous_2d(d, u)
        xy = np.asarray(xy)
        pdf = np.asarray(pdf)
        assert (pdf > 0).all()
        # empirical cell frequencies track f / integral
        xi = np.clip((xy[:, 0] * 4).astype(int), 0, 3)
        yi = np.clip((xy[:, 1] * 3).astype(int), 0, 2)
        counts = np.zeros_like(f)
        np.add.at(counts, (yi, xi), 1.0)
        expect = f / f.sum()
        got = counts / counts.sum()
        np.testing.assert_allclose(got, expect, atol=0.02)
        # pdf_2d agrees with the sampling pdf
        p2 = np.asarray(dist.pdf_2d(d, jnp.asarray(xy)))
        np.testing.assert_allclose(p2, pdf, rtol=1e-4)

    def test_zero_rows_uniform(self):
        from arendur_tpu.sampling import distribution as dist
        d = dist.build_distribution_2d(np.zeros((2, 2), np.float32))
        u = jnp.asarray([[0.3, 0.7]], jnp.float32)
        xy, pdf = dist.sample_continuous_2d(d, u)
        assert np.isfinite(np.asarray(xy)).all()


class TestRho:
    def test_lambertian_rho_equals_reflectance(self):
        from arendur_tpu import materials as mats
        from arendur_tpu.bxdf import slots as sl
        rng = np.random.default_rng(5)
        n = 8
        table = mats.make_material_table(
            [dict(mtype=mats.M_MATTE, kd=(0.25, 0.5, 0.75))])
        ns = jnp.asarray([[0.0, 0.0, 1.0]] * n, jnp.float32)
        dpdu = jnp.asarray([[1.0, 0.0, 0.0]] * n, jnp.float32)
        b = mats.compute_scattering(
            table, jnp.zeros((n,), jnp.int32), ns, ns, dpdu)
        wow = jnp.asarray([[0.3, 0.1, 0.9]] * n, jnp.float32)
        s = jnp.asarray(rng.random((64, n, 2)), jnp.float32)
        rho = np.asarray(sl.rho_hd(b, wow, s))
        np.testing.assert_allclose(rho.mean(0), [0.25, 0.5, 0.75],
                                   atol=0.02)
        s1 = jnp.asarray(rng.random((64, n, 2)), jnp.float32)
        s2 = jnp.asarray(rng.random((64, n, 2)), jnp.float32)
        rho_hh = np.asarray(sl.rho_hh(b, s1, s2))
        np.testing.assert_allclose(rho_hh.mean(0), [0.25, 0.5, 0.75],
                                   atol=0.05)


class TestStratifiedBounceDims:
    """Bounce dimensions are per-pixel stratified via a stateless
    Kensler shuffle (ref strata.rs:49-80 pre-stratified shuffled
    tables); VERDICT r3 item 9."""

    def test_strata_cover_exactly_once(self):
        from arendur_tpu.sampling import sampler as smp
        import jax.numpy as jnp
        spp = 16
        key = smp.make_base_key(3)
        for pixel in (0, 7, 12345):
            pid = jnp.full((spp,), pixel, jnp.int32)
            sid = jnp.arange(spp, dtype=jnp.int32)
            keys = smp.ray_keys(key, pid, sid)
            for dim in (5, 9, 21):
                u = np.asarray(smp.stratified_1d(keys, spp, dim))
                strata = np.sort((u * spp).astype(int))
                assert (strata == np.arange(spp)).all(), (pixel, dim)
            u2 = np.asarray(smp.stratified_2d(keys, 4, 4, 13))
            cells = np.sort(((u2[:, 1] * 4).astype(int) * 4
                             + (u2[:, 0] * 4).astype(int)))
            assert (cells == np.arange(16)).all()

    def test_dims_decorrelated(self):
        """Different dims get different shuffles (no inter-dim
        correlation of strata order)."""
        from arendur_tpu.sampling import sampler as smp
        import jax.numpy as jnp
        spp = 16
        key = smp.make_base_key(0)
        pid = jnp.zeros((spp,), jnp.int32)
        sid = jnp.arange(spp, dtype=jnp.int32)
        keys = smp.ray_keys(key, pid, sid)
        s_a = (np.asarray(smp.stratified_1d(keys, spp, 5)) * spp).astype(int)
        s_b = (np.asarray(smp.stratified_1d(keys, spp, 6)) * spp).astype(int)
        assert not (s_a == s_b).all()

    def test_variance_reduction(self):
        """Integrating u over a pixel's spp samples: stratified error
        is far below the independent-uniform error."""
        from arendur_tpu.sampling import sampler as smp
        import jax.numpy as jnp
        spp = 16
        key = smp.make_base_key(1)
        n_pix = 512
        pid = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), spp)
        sid = jnp.tile(jnp.arange(spp, dtype=jnp.int32), n_pix)
        keys = smp.ray_keys(key, pid, sid)
        u_s = np.asarray(smp.stratified_1d(keys, spp, 9)).reshape(
            n_pix, spp)
        u_i = np.asarray(smp.uniform_1d(keys, 9)).reshape(n_pix, spp)
        err_s = np.abs(u_s.mean(1) - 0.5)
        err_i = np.abs(u_i.mean(1) - 0.5)
        assert err_s.mean() < 0.35 * err_i.mean(), (
            err_s.mean(), err_i.mean())

    def test_non_pow2_falls_back(self):
        from arendur_tpu.sampling import sampler as smp
        import jax.numpy as jnp
        key = smp.make_base_key(0)
        keys = smp.ray_keys(key, jnp.zeros(6, jnp.int32),
                            jnp.arange(6, dtype=jnp.int32))
        u_s = np.asarray(smp.stratified_1d(keys, 6, 3))
        u_i = np.asarray(smp.uniform_1d(keys, 3))
        np.testing.assert_array_equal(u_s, u_i)


@pytest.mark.slow
def test_stratification_reduces_render_variance():
    """End-to-end variance gate (VERDICT r4 item 7): same-spp Cornell
    MSE against the golden image must be LOWER with the stratified
    sampler than with independent uniforms (kind="uniform", the
    reference's Naive-sampler analogue).  Mean over 3 seeds bounds MC
    flakiness; the stratified win on the film + bounce dims is ~2x in
    MSE at 8 spp, far above seed noise."""
    import dataclasses
    import os
    import jax.numpy as jnp
    from arendur_tpu.io import scenedesc
    from arendur_tpu.render import integrator as integ
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    golden = np.load(os.path.join(
        REPO, "tests/data/cornell_golden_128x96.npy"))
    h, w, _ = golden.shape
    g64 = golden.reshape(h // 2, 2, w // 2, 2, 3).mean((1, 3))

    def mse(sampler, seed):
        scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
            os.path.join(REPO, "examples/cornellbox/cb.json"),
            spp_override=8, resolution_override=(64, 48))
        config = dataclasses.replace(
            config, max_depth=8, wave_size=64 * 48 * 8,
            sampler=sampler, seed=seed,
            sample_dx=4, sample_dy=2)
        img = np.clip(np.asarray(integ.render(
            scene, camera, film_cfg, config)), 0.0, 1.0)
        return float(((img - g64) ** 2).mean())

    seeds = (0, 1, 2)
    m_strata = np.mean([mse("strata", s) for s in seeds])
    m_unif = np.mean([mse("uniform", s) for s in seeds])
    assert m_strata < m_unif, (m_strata, m_unif)
