"""The slot-table BSDF at the reference's full 8-slot width.

The reference's Bsdf aggregates up to 8 bxdfs
(ref: src/material/bsdf.rs:242-254 `sink: [*const Bxdf; 8]`); the
shipped material recipes never need more than 3, which is why
materials.build_slots uses MAX_SLOTS = 3 — but the slot machinery
itself (bsdf_evaluate / bsdf_pdf / bsdf_sample, slots.py) is
K-generic: K is the column count of the arrays (BsdfSlots.nslots),
not the constant.  This file pins that parity: a user-composed
5-lobe material in K=8 slots evaluates, pdfs and samples with the
reference's mixture semantics (sum of matching lobes / averaged pdf /
uniform lobe selection, bsdf.rs:82-144).
"""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import (
    ALL, KIND_OF_TYPE, T_LAMBERT_R, T_LAMBERT_T, T_OREN_NAYAR,
    T_TS_R, T_ASHIKHMIN, D_BECKMANN, D_TROWBRIDGE)

K = 8
LOBES = [
    # (type, c0, c1, p0, p1, p2, dist)
    (T_LAMBERT_R, (0.3, 0.2, 0.1), (0, 0, 0), 0.0, 0.0, 0.0, 0),
    (T_OREN_NAYAR, (0.1, 0.3, 0.2), (0, 0, 0), 0.86, 0.3, 0.0, 0),
    (T_TS_R, (0.4, 0.4, 0.4), (0, 0, 0), 0.2, 1.0, 1.5, D_BECKMANN),
    (T_ASHIKHMIN, (0.2, 0.1, 0.3), (0.5, 0.5, 0.5), 0.15, 0.0, 0.0,
     D_TROWBRIDGE),
    (T_LAMBERT_T, (0.1, 0.1, 0.2), (0, 0, 0), 0.0, 0.0, 0.0, 0),
]


def _unit(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _wide_bsdf(n, active, k=K):
    """BsdfSlots with `active` of the 5 lobes in the first columns of
    a K-wide table (identity shading frame)."""
    s = sl.empty_slots(n, k)
    for j, (t, c0, c1, p0, p1, p2, d) in enumerate(LOBES[:active]):
        s["type"] = s["type"].at[:, j].set(t)
        s["kind"] = s["kind"].at[:, j].set(KIND_OF_TYPE[t])
        s["c0"] = s["c0"].at[:, j].set(jnp.asarray(c0))
        s["c1"] = s["c1"].at[:, j].set(jnp.asarray(c1))
        s["p0"] = s["p0"].at[:, j].set(p0)
        s["p1"] = s["p1"].at[:, j].set(p1)
        s["p2"] = s["p2"].at[:, j].set(p2)
        s["dist"] = s["dist"].at[:, j].set(d)
    z = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    x = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    y = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    return sl.BsdfSlots(ns=z, ts=x, bs=y, ng=z,
                        eta=jnp.ones((n,), jnp.float32), **s)


def test_match_count_sees_all_lobes():
    b = _wide_bsdf(4, active=5)
    assert int(sl.match_count(b, ALL)[0]) == 5


def test_eval_is_sum_of_single_lobes():
    rng = np.random.RandomState(0)
    n = 512
    wo = jnp.asarray(_unit(rng, n))
    wi = jnp.asarray(_unit(rng, n))
    b_all = _wide_bsdf(n, active=5)
    f_all = np.asarray(sl.bsdf_evaluate(b_all, wo, wi, ALL)[0])
    f_sum = np.zeros_like(f_all)
    for j in range(5):
        s = sl.empty_slots(n, K)
        t, c0, c1, p0, p1, p2, d = LOBES[j]
        s["type"] = s["type"].at[:, j].set(t)
        s["kind"] = s["kind"].at[:, j].set(KIND_OF_TYPE[t])
        s["c0"] = s["c0"].at[:, j].set(jnp.asarray(c0))
        s["c1"] = s["c1"].at[:, j].set(jnp.asarray(c1))
        s["p0"] = s["p0"].at[:, j].set(p0)
        s["p1"] = s["p1"].at[:, j].set(p1)
        s["p2"] = s["p2"].at[:, j].set(p2)
        s["dist"] = s["dist"].at[:, j].set(d)
        b1 = b_all.replace(**s)
        f_sum += np.asarray(sl.bsdf_evaluate(b1, wo, wi, ALL)[0])
    np.testing.assert_allclose(f_all, f_sum, rtol=2e-5, atol=1e-6)


def test_pdf_is_average_over_matching():
    rng = np.random.RandomState(1)
    n = 512
    wo = jnp.asarray(_unit(rng, n))
    wi = jnp.asarray(_unit(rng, n))
    b_all = _wide_bsdf(n, active=5)
    p_all = np.asarray(sl.bsdf_pdf(b_all, wo, wi, ALL))
    p_sum = np.zeros_like(p_all)
    for j in range(5):
        t, c0, c1, p0, p1, p2, d = LOBES[j]
        stype = jnp.full((n,), t, jnp.int32)
        p_sum += np.asarray(sl.slot_pdf(
            stype, jnp.full((n,), p0), jnp.full((n,), p1),
            jnp.full((n,), p2), jnp.full((n,), d, jnp.int32), wo, wi))
    np.testing.assert_allclose(p_all, p_sum / 5.0, rtol=2e-5,
                               atol=1e-6)


def test_sample_reaches_every_lobe():
    """u.x uniform-lobe selection (bsdf.rs:104-110) must reach all 5
    lobes of the wide table, return finite f and a pdf consistent
    with bsdf_pdf for non-specular picks."""
    rng = np.random.RandomState(2)
    n = 2048
    wo = jnp.asarray(np.abs(_unit(rng, n)) * np.asarray([1, 1, 1]))
    u = jnp.asarray(rng.uniform(0, 1, (n, 2)), np.float32)
    b = _wide_bsdf(n, active=5)
    f, wiw, pdf, kind = sl.bsdf_sample(b, wo, u, ALL)
    f, wiw, pdf, kind = map(np.asarray, (f, wiw, pdf, kind))
    assert np.isfinite(f).all() and np.isfinite(pdf).all()
    # every lobe index selected at least once
    idx = np.minimum((np.asarray(u)[:, 0] * 5).astype(int), 4)
    assert set(idx.tolist()) == {0, 1, 2, 3, 4}
    ok = pdf > 0
    assert ok.mean() > 0.5
    # mixture pdf consistency on the sampled directions
    p_ref = np.asarray(sl.bsdf_pdf(b, wo, jnp.asarray(wiw), ALL))
    np.testing.assert_allclose(pdf[ok], p_ref[ok], rtol=1e-4,
                               atol=1e-6)
