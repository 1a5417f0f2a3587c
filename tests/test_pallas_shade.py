"""Parity of the Pallas BSDF shade kernels (bxdf/pallas_shade.py)
against the XLA slots.py path, run in interpret mode on CPU.

Covers every material recipe (matte-Lambert, matte-Oren-Nayar,
plastic/Ashikhmin-Beckmann, glass incl. total-internal-reflection
lanes, translucent), slot-presence pruning, and the custom-VJP
gradient fallback.  The kernels reuse slots.py's math verbatim, so
parity is exact up to f32 reassociation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arendur_tpu import materials as mats
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf import pallas_shade as ps


def _mixed_bsdf(n=1024, seed=0, table_rows=None, grazing=False):
    rows = table_rows or [
        dict(mtype=mats.M_MATTE, kd=(.5, .4, .3)),                 # lambert
        dict(mtype=mats.M_MATTE, kd=(.6, .6, .2), sigma=20.0),     # oren-nayar
        dict(mtype=mats.M_PLASTIC, kd=(.4, .2, .1), ks=(.5, .5, .5),
             roughness=500.0),                                     # AS beckmann
        dict(mtype=mats.M_GLASS, kd=(.9, .9, .9), ks=(1., 1., 1.),
             eta=1.5, roughness=200.0),                            # 3-slot glass
        dict(mtype=mats.M_TRANSLUCENT, kd=(.5, .5, .5), ks=(.3, .3, .3),
             dissolve=0.5, roughness=300.0),                       # AS + lambertT
    ]
    table = mats.make_material_table(rows)
    rng = np.random.RandomState(seed)
    mat_id = jnp.asarray(rng.randint(0, len(rows), n), jnp.int32)
    ns = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ns = ns / jnp.linalg.norm(ns, axis=-1, keepdims=True)
    dpdu = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    b = mats.compute_scattering(table, mat_id, ns, ns, dpdu)
    wow = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    if grazing:
        # push wo nearly into the surface plane: TIR for the glass
        # lanes (sin^2 theta_t > 1 on the dense->sparse side)
        wow = wow - ns * np.asarray(
            (wow * ns).sum(-1, keepdims=True)) * 0.995
    wow = wow / jnp.linalg.norm(wow, axis=-1, keepdims=True)
    u = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    return b, wow, u, rng


def _assert_close(a, b, name, atol=2e-4, rtol=2e-4):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=name)


class TestSampleParity:
    def test_all_material_types(self):
        b, wow, u, _ = _mixed_bsdf()
        f_p, wi_p, pdf_p, k_p = ps.bsdf_sample(b, wow, u, sl.ALL, True)
        f_x, wi_x, pdf_x, k_x = sl.bsdf_sample(b, wow, u, sl.ALL)
        _assert_close(f_p, f_x, "f")
        _assert_close(wi_p, wi_x, "wi")
        _assert_close(pdf_p, pdf_x, "pdf")
        np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_x))

    def test_glass_tir_lanes(self):
        """Grazing wo forces total internal reflection in glass: the
        refract branch must agree (zero-f dead lanes included)."""
        b, wow, u, _ = _mixed_bsdf(grazing=True, table_rows=[
            dict(mtype=mats.M_GLASS, kd=(.9, .9, .9), ks=(1., 1., 1.),
                 eta=1.5, roughness=200.0)])
        f_p, wi_p, pdf_p, k_p = ps.bsdf_sample(b, wow, u, sl.ALL, True)
        f_x, wi_x, pdf_x, k_x = sl.bsdf_sample(b, wow, u, sl.ALL)
        _assert_close(f_p, f_x, "f", atol=1e-3, rtol=1e-3)
        _assert_close(wi_p, wi_x, "wi")
        _assert_close(pdf_p, pdf_x, "pdf")
        np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_x))

    def test_non_specular_types_filter(self):
        b, wow, u, _ = _mixed_bsdf(seed=3)
        t = sl.ALL_NON_SPECULAR if hasattr(sl, "ALL_NON_SPECULAR") else (
            sl.ALL & ~sl.SPECULAR)
        f_p, wi_p, pdf_p, k_p = ps.bsdf_sample(b, wow, u, t, True)
        f_x, wi_x, pdf_x, k_x = sl.bsdf_sample(b, wow, u, t)
        _assert_close(f_p, f_x, "f")
        _assert_close(pdf_p, pdf_x, "pdf")
        np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_x))

    def test_presence_pruning_honored(self):
        """The kernel compiles with the table's static slot presence;
        single-family tables skip the other families entirely and must
        still agree with the XLA path."""
        b, wow, u, _ = _mixed_bsdf(table_rows=[
            dict(mtype=mats.M_MATTE, kd=(.5, .4, .3))])
        assert b.present is not None
        f_p, wi_p, pdf_p, _ = ps.bsdf_sample(b, wow, u, sl.ALL, True)
        f_x, wi_x, pdf_x, _ = sl.bsdf_sample(b, wow, u, sl.ALL)
        _assert_close(f_p, f_x, "f")
        _assert_close(wi_p, wi_x, "wi")
        _assert_close(pdf_p, pdf_x, "pdf")


class TestEvalPdfParity:
    def test_all_material_types(self):
        b, wow, u, rng = _mixed_bsdf(seed=5)
        wiw = jnp.asarray(rng.normal(size=wow.shape), jnp.float32)
        wiw = wiw / jnp.linalg.norm(wiw, axis=-1, keepdims=True)
        f_p, pdf_p = ps.bsdf_eval_pdf(b, wow, wiw, sl.ALL, True)
        f_x, pdf_x = sl.bsdf_eval_pdf(b, wow, wiw, sl.ALL)
        _assert_close(f_p, f_x, "f")
        _assert_close(pdf_p, pdf_x, "pdf")


class TestGradFallback:
    @pytest.mark.slow
    def test_sample_vjp_matches_xla(self):
        """The custom-VJP backward (XLA re-derivation) must match
        grads of the pure XLA path w.r.t. material colors."""
        b, wow, u, _ = _mixed_bsdf(n=256, seed=7)

        def loss_pallas(c0):
            f, _, pdf, _ = ps.bsdf_sample(
                b.replace(c0=c0), wow, u, sl.ALL, True)
            return jnp.sum(f) + jnp.sum(pdf)

        def loss_xla(c0):
            f, _, pdf, _ = sl.bsdf_sample(b.replace(c0=c0), wow, u, sl.ALL)
            return jnp.sum(f) + jnp.sum(pdf)

        g_p = jax.grad(loss_pallas)(b.c0)
        g_x = jax.grad(loss_xla)(b.c0)
        _assert_close(g_p, g_x, "dc0", atol=1e-3, rtol=1e-3)

    def test_eval_pdf_vjp_matches_xla(self):
        b, wow, u, rng = _mixed_bsdf(n=256, seed=9)
        wiw = jnp.asarray(rng.normal(size=wow.shape), jnp.float32)
        wiw = wiw / jnp.linalg.norm(wiw, axis=-1, keepdims=True)

        def loss_pallas(c0):
            f, pdf = ps.bsdf_eval_pdf(
                b.replace(c0=c0), wow, wiw, sl.ALL, True)
            return jnp.sum(f * 0.5) + jnp.sum(pdf)

        def loss_xla(c0):
            f, pdf = sl.bsdf_eval_pdf(b.replace(c0=c0), wow, wiw, sl.ALL)
            return jnp.sum(f * 0.5) + jnp.sum(pdf)

        g_p = jax.grad(loss_pallas)(b.c0)
        g_x = jax.grad(loss_xla)(b.c0)
        _assert_close(g_p, g_x, "dc0", atol=1e-3, rtol=1e-3)


class TestMegaBouncePipeline:
    """End-to-end CPU parity of the TPU kernel pipeline in interpret
    mode: intersect kernels + the bounce mega-kernel
    (render/pallas_bounce.py) against the default XLA composition."""

    def _render(self, env, monkeypatch):
        import dataclasses
        import os as _os
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        from arendur_tpu.io import scenedesc
        from arendur_tpu.render import integrator as integ
        REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
            _os.path.join(REPO, "examples/cornellbox/cb.json"),
            spp_override=2, resolution_override=(16, 12))
        config = dataclasses.replace(config, max_depth=3,
                                     wave_size=16 * 12 * 2)
        return np.asarray(integ.render(scene, camera, film_cfg, config))

    @pytest.mark.slow
    def test_full_kernel_pipeline_parity(self, monkeypatch):
        """Row-form mega kernel (ARENDUR_CBOUNCE=0 forces it; the
        component kernel has its own gate below)."""
        ref = self._render({}, monkeypatch)
        img = self._render({"ARENDUR_SHADE": "pallas",
                            "ARENDUR_INTERSECT": "pallas",
                            "ARENDUR_CBOUNCE": "0",
                            "ARENDUR_PALLAS_INTERPRET": "1"},
                           monkeypatch)
        assert ref.mean() > 0.01
        np.testing.assert_allclose(img, ref, atol=2e-3)

    @pytest.mark.slow
    def test_cbounce_kernel_pipeline_parity(self, monkeypatch):
        """Component-form (lane-transposed) mega kernel
        (render/cbounce.py, the default on TPU) against the XLA
        composition — the end-to-end leg of the cbounce parity
        harness (tests/test_cbounce.py has the per-stage fuzz)."""
        ref = self._render({}, monkeypatch)
        img = self._render({"ARENDUR_SHADE": "pallas",
                            "ARENDUR_INTERSECT": "pallas",
                            "ARENDUR_CBOUNCE": "1",
                            "ARENDUR_PALLAS_INTERPRET": "1"},
                           monkeypatch)
        assert ref.mean() > 0.01
        np.testing.assert_allclose(img, ref, atol=2e-3)

    @pytest.mark.slow
    def test_kernel_spheres_parity(self, monkeypatch):
        ref = self._render({}, monkeypatch)
        img = self._render({"ARENDUR_SHADE": "pallas",
                            "ARENDUR_INTERSECT": "pallas",
                            "ARENDUR_SPHERES": "kernel",
                            "ARENDUR_PALLAS_INTERPRET": "1"},
                           monkeypatch)
        np.testing.assert_allclose(img, ref, atol=2e-3)
