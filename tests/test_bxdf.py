"""BxDF correctness: normalization, sampling consistency, mixtures."""

import numpy as np
import jax
import jax.numpy as jnp

from arendur_tpu.bxdf import microfacet as mf
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf import fresnel as fr
from arendur_tpu.bxdf.types import (
    ALL, SPECULAR, REFLECTION, TRANSMISSION,
    T_LAMBERT_R, T_OREN_NAYAR, T_FRESNEL_SPEC, T_ASHIKHMIN,
    D_BECKMANN, D_TROWBRIDGE)
from arendur_tpu import materials as mats
from arendur_tpu.sampling import warps


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def uniform_hemisphere(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(n, 2)).astype(np.float32)
    z = u[:, 0]
    st = np.sqrt(np.maximum(1 - z * z, 0))
    phi = 2 * np.pi * u[:, 1]
    return np.stack([st * np.cos(phi), st * np.sin(phi), z], -1)


class TestFresnel:
    def test_normal_incidence(self):
        f = float(fr.fresnel_dielectric(
            jnp.asarray([1.0]), jnp.asarray([1.0]), jnp.asarray([1.5]))[0])
        np.testing.assert_allclose(f, ((0.5 / 2.5) ** 2), rtol=1e-5)

    def test_total_internal_reflection(self):
        # from glass side at grazing angle
        f = float(fr.fresnel_dielectric(
            jnp.asarray([-0.2]), jnp.asarray([1.0]), jnp.asarray([1.5]))[0])
        assert f == 1.0

    def test_increases_to_grazing(self):
        cos = jnp.asarray([1.0, 0.7, 0.3, 0.05])
        f = np.asarray(fr.fresnel_dielectric(
            cos, jnp.ones(4), jnp.full((4,), 1.5)))
        assert (np.diff(f) > 0).all()


class TestMicrofacet:
    def _norm_test(self, dist_id, alpha, seed):
        # int D(wh) cos(wh) dwh = 1 over the hemisphere
        n = 200_000
        wh = jnp.asarray(uniform_hemisphere(n, seed))
        a = jnp.full((n,), alpha, jnp.float32)
        d = np.asarray(mf.distribution(
            jnp.full((n,), dist_id, jnp.int32), wh, a, a))
        est = (d * np.asarray(wh)[:, 2]).mean() * 2 * np.pi
        np.testing.assert_allclose(est, 1.0, atol=0.05)

    def test_beckmann_normalized(self):
        self._norm_test(D_BECKMANN, 0.5, 1)

    def test_trowbridge_normalized(self):
        self._norm_test(D_TROWBRIDGE, 0.5, 2)

    def _pdf_norm(self, dist_id, alpha, seed):
        # int pdf_wh(wo, wh) dwh = 1 (visible-normal pdf)
        n = 400_000
        wo = jnp.broadcast_to(
            jnp.asarray(unit([0.4, 0.1, 0.9])), (n, 3))
        wh = jnp.asarray(uniform_hemisphere(n, seed))
        a = jnp.full((n,), alpha, jnp.float32)
        p = np.asarray(mf.pdf_wh(
            jnp.full((n,), dist_id, jnp.int32), wo, wh, a, a))
        est = p.mean() * 2 * np.pi
        np.testing.assert_allclose(est, 1.0, atol=0.08)

    def test_beckmann_pdf_normalized(self):
        self._pdf_norm(D_BECKMANN, 0.4, 3)

    def test_trowbridge_pdf_normalized(self):
        self._pdf_norm(D_TROWBRIDGE, 0.4, 4)

    def _sample_matches_pdf(self, dist_id, alpha, seed):
        """KS-style check: cos-theta histogram of sample_wh vs pdf_wh."""
        n = 100_000
        rng = np.random.default_rng(seed)
        wo = jnp.broadcast_to(jnp.asarray(unit([0.3, -0.2, 0.93])), (n, 3))
        u = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        a = jnp.full((n,), alpha, jnp.float32)
        dist = jnp.full((n,), dist_id, jnp.int32)
        wh = np.asarray(mf.sample_wh(dist, wo, u, a, a))
        assert np.isfinite(wh).all()
        np.testing.assert_allclose(
            np.linalg.norm(wh, axis=-1), 1.0, atol=1e-4)
        # mean cos theta of samples vs pdf-weighted integral
        whu = jnp.asarray(uniform_hemisphere(n, seed + 10))
        p = np.asarray(mf.pdf_wh(dist, wo, whu, a, a))
        expected = (p * np.asarray(whu)[:, 2]).mean() * 2 * np.pi
        got = wh[:, 2].mean()
        np.testing.assert_allclose(got, expected, atol=0.02)

    def test_beckmann_sampling(self):
        self._sample_matches_pdf(D_BECKMANN, 0.5, 5)

    def test_trowbridge_sampling(self):
        self._sample_matches_pdf(D_TROWBRIDGE, 0.5, 6)


def single_slot_bsdf(n, stype, c0=(1, 1, 1), c1=(0, 0, 0), p0=0.0,
                     p1=0.0, p2=0.0, dist=D_BECKMANN):
    from arendur_tpu.bxdf.types import KIND_OF_TYPE
    mk3 = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n, 3))
    z = jnp.asarray([0.0, 0.0, 1.0])
    x = jnp.asarray([1.0, 0.0, 0.0])
    y = jnp.asarray([0.0, 1.0, 0.0])
    sc = lambda v: jnp.full((n, 1), v, jnp.float32)
    return sl.BsdfSlots(
        ns=mk3(z), ts=mk3(x), bs=mk3(y), ng=mk3(z),
        eta=jnp.ones((n,), jnp.float32),
        type=jnp.full((n, 1), stype, jnp.int32),
        kind=jnp.full((n, 1), KIND_OF_TYPE[stype], jnp.int32),
        c0=mk3(c0)[:, None, :], c1=mk3(c1)[:, None, :],
        p0=sc(p0), p1=sc(p1), p2=sc(p2),
        dist=jnp.full((n, 1), dist, jnp.int32))


class TestBsdfSlots:
    def test_lambert_furnace(self):
        # E[f cos / pdf] == reflectance for Lambertian
        n = 100_000
        b = single_slot_bsdf(n, T_LAMBERT_R, c0=(0.5, 0.7, 0.2))
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        wow = jnp.broadcast_to(jnp.asarray(unit([0.3, 0.1, 0.95])), (n, 3))
        f, wiw, pdf, kind = sl.bsdf_sample(b, wow, u)
        w = np.asarray(f) * np.abs(np.asarray(wiw)[:, 2:3]) \
            / np.asarray(pdf)[:, None]
        np.testing.assert_allclose(w.mean(0), [0.5, 0.7, 0.2], atol=0.01)

    def test_lambert_eval_pdf(self):
        n = 4
        b = single_slot_bsdf(n, T_LAMBERT_R, c0=(0.8, 0.8, 0.8))
        wow = jnp.broadcast_to(jnp.asarray(unit([0, 0, 1.0])), (n, 3))
        wiw = jnp.broadcast_to(jnp.asarray(unit([0.5, 0, 0.87])), (n, 3))
        f, _ = sl.bsdf_evaluate(b, wow, wiw)
        np.testing.assert_allclose(
            np.asarray(f)[0], 0.8 / np.pi, rtol=1e-5)
        p = sl.bsdf_pdf(b, wow, wiw)
        np.testing.assert_allclose(
            float(p[0]), abs(unit([0.5, 0, 0.87])[2]) / np.pi, rtol=1e-4)

    def test_oren_nayar_reduces_to_lambert(self):
        n = 4
        # sigma -> 0: A=1, B=0
        b = single_slot_bsdf(n, T_OREN_NAYAR, c0=(0.6, 0.6, 0.6),
                             p0=1.0, p1=0.0)
        wow = jnp.broadcast_to(jnp.asarray(unit([0.2, 0.1, 0.97])), (n, 3))
        wiw = jnp.broadcast_to(jnp.asarray(unit([-0.4, 0.2, 0.89])), (n, 3))
        f, _ = sl.bsdf_evaluate(b, wow, wiw)
        np.testing.assert_allclose(
            np.asarray(f)[0], 0.6 / np.pi, rtol=1e-4)

    def test_fresnel_specular_energy(self):
        # perfect white glass: E[f cos / pdf] == 1 (energy conserving)
        n = 100_000
        b = single_slot_bsdf(n, T_FRESNEL_SPEC, c0=(1, 1, 1), c1=(1, 1, 1),
                             p0=1.0, p1=1.5)
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        wow = jnp.broadcast_to(jnp.asarray(unit([0.4, 0.0, 0.92])), (n, 3))
        f, wiw, pdf, kind = sl.bsdf_sample(b, wow, u)
        k = np.asarray(kind)
        assert ((k & SPECULAR) != 0).all()
        w = np.asarray(f)[:, 0] * np.abs(np.asarray(wiw)[:, 2]) \
            / np.asarray(pdf)
        # reflection carries weight F/F=1 per unit; transmission is
        # scaled by eta^2 (radiance compression) — expected mean is
        # F + (1-F) * (1/1.5)^2
        F = float(fr.fresnel_dielectric(
            jnp.asarray([unit([0.4, 0.0, 0.92])[2]]),
            jnp.asarray([1.0]), jnp.asarray([1.5]))[0])
        expected = F + (1.0 - F) * (1.0 / 1.5) ** 2
        np.testing.assert_allclose(w.mean(), expected, atol=0.02)
        # both branches exercised
        assert ((k & REFLECTION) != 0).any()
        assert ((k & TRANSMISSION) != 0).any()

    def test_ashikhmin_energy_bounded(self):
        n = 100_000
        b = single_slot_bsdf(n, T_ASHIKHMIN, c0=(0.5, 0.5, 0.5),
                             c1=(0.3, 0.3, 0.3),
                             p0=float(mf.roughness_to_alpha(0.3)),
                             dist=D_BECKMANN)
        rng = np.random.default_rng(2)
        u = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        wow = jnp.broadcast_to(jnp.asarray(unit([0.2, 0.3, 0.93])), (n, 3))
        f, wiw, pdf, _ = sl.bsdf_sample(b, wow, u)
        ok = np.asarray(pdf) > 0
        w = (np.asarray(f)[ok] * np.abs(np.asarray(wiw)[ok, 2:3])
             / np.asarray(pdf)[ok, None])
        m = w.mean(0)
        assert (m > 0.05).all() and (m < 1.2).all(), m

    def test_sample_eval_pdf_consistency_ashikhmin(self):
        # for sampled directions, returned f/pdf must equal
        # evaluate()/pdf() queried independently
        n = 4096
        b = single_slot_bsdf(n, T_ASHIKHMIN, c0=(0.4, 0.4, 0.4),
                             c1=(0.4, 0.4, 0.4),
                             p0=float(mf.roughness_to_alpha(0.4)),
                             dist=D_BECKMANN)
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        wow = jnp.broadcast_to(jnp.asarray(unit([0.1, -0.5, 0.86])), (n, 3))
        f, wiw, pdf, _ = sl.bsdf_sample(b, wow, u)
        f2, _ = sl.bsdf_evaluate(b, wow, wiw)
        p2 = sl.bsdf_pdf(b, wow, wiw)
        ok = np.asarray(pdf) > 1e-6
        np.testing.assert_allclose(
            np.asarray(f)[ok], np.asarray(f2)[ok], rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pdf)[ok], np.asarray(p2)[ok], rtol=2e-3, atol=1e-5)


class TestMaterials:
    def test_matte_builds_lambert(self):
        table = mats.make_material_table([
            dict(mtype=mats.M_MATTE, kd=(0.5, 0.5, 0.5), sigma=0.0),
            dict(mtype=mats.M_MATTE, kd=(0.5, 0.5, 0.5), sigma=3.0),
            dict(mtype=mats.M_GLASS, kd=(0.7, 0.7, 0.7),
                 ks=(1.0, 1.0, 1.0), roughness=0.99, eta=1.5),
            dict(mtype=mats.M_PLASTIC, kd=(0.5, 0.5, 0.5),
                 ks=(0.3, 0.3, 0.3), roughness=0.3),
        ])
        n = 4
        mat_id = jnp.asarray([0, 1, 2, 3], jnp.int32)
        z = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        b = mats.compute_scattering(table, mat_id, z, z, x)
        types = np.asarray(b.type)
        assert types[0, 0] == T_LAMBERT_R and types[0, 1] == 0
        assert types[1, 0] == T_OREN_NAYAR
        from arendur_tpu.bxdf.types import T_TS_R, T_TS_T
        assert list(types[2]) == [T_FRESNEL_SPEC, T_TS_R, T_TS_T]
        assert types[3, 0] == T_ASHIKHMIN
        assert int(sl.match_count(b)[2]) == 3

    def test_glass_no_diffuse(self):
        table = mats.make_material_table([
            dict(mtype=mats.M_GLASS, kd=(0, 0, 0), ks=(1, 1, 1),
                 roughness=0.0, eta=1.5)])
        n = 1
        z = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        b = mats.compute_scattering(
            table, jnp.zeros((n,), jnp.int32), z, z, x)
        types = np.asarray(b.type)
        assert list(types[0]) == [T_FRESNEL_SPEC, 0, 0]


class TestFusedEvalPdf:
    """slot_eval_pdf_fused shares the per-family microfacet work; the
    split slot_eval + slot_pdf remain the oracles."""

    def test_matches_split_all_families(self):
        import jax.numpy as jnp
        from arendur_tpu.bxdf import slots as sl
        from arendur_tpu.bxdf.types import (
            T_LAMBERT_R, T_LAMBERT_T, T_OREN_NAYAR, T_TS_R, T_TS_T,
            T_ASHIKHMIN, D_BECKMANN, D_TROWBRIDGE)
        rng = np.random.default_rng(0)
        n = 4096
        types = np.array([T_LAMBERT_R, T_LAMBERT_T, T_OREN_NAYAR,
                          T_TS_R, T_TS_T, T_ASHIKHMIN], np.int32)
        stype = jnp.asarray(rng.choice(types, n), jnp.int32)
        c0 = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        c1 = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        p0 = jnp.asarray(rng.uniform(0.05, 1.0, n), jnp.float32)
        p1 = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
        p2 = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
        dist = jnp.asarray(rng.choice(
            [D_BECKMANN, D_TROWBRIDGE], n), jnp.int32)

        def rand_dirs():
            v = rng.normal(size=(n, 3))
            return jnp.asarray(
                v / np.linalg.norm(v, axis=-1, keepdims=True),
                jnp.float32)
        wo = rand_dirs()
        wi = rand_dirs()
        f_s = sl.slot_eval(stype, c0, c1, p0, p1, p2, dist, wo, wi)
        p_s = sl.slot_pdf(stype, p0, p1, p2, dist, wo, wi)
        f_f, p_f = sl.slot_eval_pdf_fused(stype, c0, c1, p0, p1, p2,
                                          dist, wo, wi)
        np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_s),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_s),
                                   rtol=2e-5, atol=2e-6)


class TestDistPresenceCrossCheck:
    def test_dist_presence_matches_build_slots_emissions(self):
        """dist_presence's static pruning sets must cover the dist
        values build_slots actually emits per slot type (ADVICE r4: the
        coupling between the recipes and the pruning table was silent;
        both now read materials.RECIPE_DISTS, and this gate would catch
        a recipe changing its distribution without the table)."""
        import jax.numpy as jnp
        from arendur_tpu import materials as mats
        from arendur_tpu.bxdf.types import T_TS_R, T_TS_T, T_ASHIKHMIN
        rows = [
            dict(mtype=mats.M_MATTE, kd=(0.5, 0.5, 0.5), sigma=0.3),
            dict(mtype=mats.M_PLASTIC, kd=(0.4, 0.4, 0.4),
                 ks=(0.6, 0.6, 0.6), roughness=0.2),
            dict(mtype=mats.M_GLASS, kd=(0.2, 0.2, 0.2),
                 ks=(0.9, 0.9, 0.9), roughness=0.1, eta=1.5),
            dict(mtype=mats.M_TRANSLUCENT, kd=(0.5, 0.5, 0.5),
                 ks=(0.3, 0.3, 0.3), roughness=0.3, dissolve=0.5),
        ]
        table = mats.make_material_table(rows)
        declared = dict(mats.dist_presence(table))
        n = len(rows)
        z = jnp.zeros((n, 3), jnp.float32)
        up = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                      (n, 1))
        du = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
                      (n, 1))
        bsdf = mats.build_slots(
            jnp.asarray(table.mtype), jnp.asarray(table.kd),
            jnp.asarray(table.ks), jnp.asarray(table.sigma),
            jnp.asarray(table.roughness), jnp.asarray(table.eta),
            jnp.asarray(table.dissolve), up, up, du,
            presence=mats.slot_presence(table))
        stype = np.asarray(bsdf.type)
        dists = np.asarray(bsdf.dist)
        for t in (T_TS_R, T_TS_T, T_ASHIKHMIN):
            emitted = set(np.unique(dists[stype == t]).tolist())
            if emitted:
                assert t in declared, \
                    f"type {t} emitted but not in dist_presence"
                assert emitted <= set(declared[t]), \
                    (t, emitted, declared[t])
