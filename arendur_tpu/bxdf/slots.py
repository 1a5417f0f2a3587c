"""Slot-table BSDF: branchless wavefront mixture of bxdfs.

The reference's ``Bsdf`` aggregates <=8 arena-allocated trait objects
and dispatches virtually (ref: src/material/bsdf.rs).  Here every hit
carries K fixed slots of typed parameter records; each bxdf model is
evaluated for all lanes and the result masked by slot type.  The
mixture semantics (uniform slot selection by u.x, specular handling,
reflect/transmit classification against the geometric normal, pdf
averaging) mirror Bsdf::{evaluate, evaluate_sampled, pdf}
(bsdf.rs:82-222) exactly — including the reference's quirks, which are
load-bearing for output parity:

* the slot-selection sample u is passed to the chosen bxdf *without*
  remapping (bsdf.rs:118), so e.g. FresnelBxdf's reflect/refract choice
  sees a conditional u.x;
* after a non-specular sample from a multi-slot bsdf, f and pdf are
  re-accumulated only over slots whose kind intersects the *sampled*
  kind, with the reflect/transmit test applied to the pdf sum too
  (bsdf.rs:130-143);
* direct lighting samples with BXDF_ALL including specular
  (scene.rs:130), so specular paths contribute in both the NEE bsdf
  branch and the specular-bounce Le re-add, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from arendur_tpu.geometry import frame
from arendur_tpu.geometry.vec import vec3, dot, cross, normalize
from arendur_tpu.bxdf import microfacet as mf
from arendur_tpu.bxdf.fresnel import fresnel_dielectric, schlick_fresnel
from arendur_tpu.bxdf.types import (
    REFLECTION, TRANSMISSION, DIFFUSE, GLOSSY, SPECULAR, ALL,
    T_NONE, T_LAMBERT_R, T_LAMBERT_T, T_OREN_NAYAR, T_FRESNEL_SPEC,
    T_TS_R, T_TS_T, T_ASHIKHMIN, T_SPECULAR_R, T_SPECULAR_T,
    KIND_OF_TYPE)

PI = float(jnp.pi)
INV_PI = 1.0 / PI
MAX_SLOTS = 3  # glass uses 3 (fresnel + TS-R + TS-T); others fewer
# Finite ceiling for scalar BRDF multipliers before they touch a
# color: slot_sample/slot_eval compute EVERY family for every lane and
# mask afterwards, and an inf in a masked branch poisons reverse-mode
# (d(c0 * inf)/d c0 = inf meets the mask's zero cotangent -> NaN).
# 1e12 is far beyond any physical BRDF value; affected samples were
# already rejected as invalid downstream.
_FMAX = 1e12


def _fin(x):
    return jnp.clip(x, -_FMAX, _FMAX)


@struct.dataclass
class BsdfSlots:
    """Per-hit shading frame + K bxdf slots (SoA)."""
    ns: jnp.ndarray    # [N,3] shading normal (local +z)
    ts: jnp.ndarray    # [N,3] shading tangent
    bs: jnp.ndarray    # [N,3] shading bitangent
    ng: jnp.ndarray    # [N,3] geometric normal
    eta: jnp.ndarray   # [N]
    type: jnp.ndarray  # [N,K] int32 slot type ids
    kind: jnp.ndarray  # [N,K] int32 kind bitflags
    c0: jnp.ndarray    # [N,K,3]
    c1: jnp.ndarray    # [N,K,3]
    p0: jnp.ndarray    # [N,K]
    p1: jnp.ndarray    # [N,K]
    p2: jnp.ndarray    # [N,K]
    dist: jnp.ndarray  # [N,K] int32
    # static per-slot-column sets of bxdf types the scene's materials
    # can place there (materials.slot_presence); None = any.  Lets the
    # eval/pdf/sample sweeps skip whole bxdf families: masked-out SIMD
    # work is only free if it is never emitted.
    present: tuple = struct.field(pytree_node=False, default=None)
    # static (type_id, (D_*, ...)) pairs: which microfacet
    # distributions each family can carry (materials.dist_presence);
    # None = any.  Single-member sets drop the other model's code —
    # e.g. glass TS slots are always Trowbridge, so the Beckmann
    # Newton solver vanishes from the TS sweeps.
    dists: tuple = struct.field(pytree_node=False, default=None)

    @property
    def nslots(self):
        return self.type.shape[-1]

    def col_present(self, k: int):
        """Type set possibly present in slot column k (None = all)."""
        if self.present is None:
            return None
        return self.present[k]

    def any_present(self):
        """Union over columns (None = all)."""
        if self.present is None:
            return None
        out = set()
        for c in self.present:
            out |= set(c)
        return tuple(sorted(out))


def _fam_dists(dist_sets, *types):
    """Static distribution set for the given families (None = any)."""
    if dist_sets is None:
        return None
    out = set()
    for t, ds in dist_sets:
        if t in types:
            out |= set(ds)
    return tuple(sorted(out)) if out else None


def make_bsdf_frame(ns, ng, dpdu):
    """(ts, bs) from shading normal + dpdu hint (ref: bsdf.rs:36-44)."""
    t = dpdu - ns * dot(ns, dpdu, keepdims=True)
    bad = (t[..., 0]**2 + t[..., 1]**2 + t[..., 2]**2)[..., None] < 1e-12
    fb_u, _ = frame.get_basis_from(ns)
    t = normalize(jnp.where(bad, fb_u, t))
    b = normalize(cross(ns, t))
    return t, b


def empty_slots(n: int, k: int = MAX_SLOTS) -> dict:
    """Mutable host-style dict of empty slot arrays to be filled by
    materials, then frozen into BsdfSlots."""
    return dict(
        type=jnp.zeros((n, k), jnp.int32),
        kind=jnp.zeros((n, k), jnp.int32),
        c0=jnp.zeros((n, k, 3), jnp.float32),
        c1=jnp.zeros((n, k, 3), jnp.float32),
        p0=jnp.zeros((n, k), jnp.float32),
        p1=jnp.zeros((n, k), jnp.float32),
        p2=jnp.zeros((n, k), jnp.float32),
        dist=jnp.zeros((n, k), jnp.int32),
    )


# ---------------------------------------------------------------------------
# per-slot evaluate / pdf (wo, wi in the local shading frame)
# ---------------------------------------------------------------------------

def _oren_nayar_eval(c0, p0, p1, wo, wi):
    """ref: bxdf/oren_nayar.rs:40-60; A=p0, B=p1."""
    sin_ti = frame.sin_theta(wi)
    sin_to = frame.sin_theta(wo)
    sin_pi_ = frame.sin_phi(wi)
    sin_po = frame.sin_phi(wo)
    cos_pi_ = frame.cos_phi(wi)
    cos_po = frame.cos_phi(wo)
    dcos = cos_pi_ * cos_po + sin_pi_ * sin_po
    max_cos = jnp.where((sin_ti > 1e-4) | (sin_to > 1e-4),
                        jnp.maximum(0.0, dcos), 0.0)
    ci = jnp.abs(frame.cos_theta(wi))
    co = jnp.abs(frame.cos_theta(wo))
    sin_a = jnp.where(ci > co, sin_to, sin_ti)
    # clamp the grazing-angle tan spike: unbounded in the reference,
    # it overflows f32 reverse-mode when amplified along a path
    tan_b = jnp.minimum(
        jnp.where(ci > co, sin_ti / jnp.maximum(ci, 1e-12),
                  sin_to / jnp.maximum(co, 1e-12)), 1e4)
    return c0 * (INV_PI
                 * (p0 + p1 * max_cos * sin_a * tan_b))[..., None]


def _ts_r_eval(c0, alpha, eta0, eta1, dist, wo, wi, dists=None):
    """Torrance-Sparrow reflection (ref: microfacet.rs:396-406) with
    dielectric fresnel."""
    wh = normalize(wo + wi)
    nanmask = ~jnp.all(jnp.isfinite(wh), axis=-1)
    d = mf.distribution(dist, wh, alpha, alpha, dists)
    g = mf.visible_both(dist, wo, wi, alpha, alpha, dists)
    fr = fresnel_dielectric(dot(wi, wh), eta0, eta1)
    denom = 4.0 * jnp.abs(wo[..., 2]) * jnp.abs(wi[..., 2])
    f = c0 * _fin(d * g * fr / jnp.maximum(denom, 1e-20))[..., None]
    return jnp.where(nanmask[..., None], 0.0, f)


def _safe_ratio(a, b):
    """eta ratio with clamped magnitude: zero-filled inactive slots
    otherwise produce eta ~ 1e20, and wi*eta then overflows
    float32 length^2 inside normalize -> NaN."""
    r = a / jnp.where(jnp.abs(b) < 1e-20, 1e-20, b)
    return jnp.clip(r, -1e3, 1e3)


def _ts_t_eval(c0, alpha, eta0, eta1, dist, wo, wi, dists=None):
    """Torrance-Sparrow transmission (ref: microfacet.rs:459-490)."""
    same_side = wo[..., 2] * wi[..., 2] > 0.0
    eta = jnp.where(wo[..., 2] > 0.0, _safe_ratio(eta1, eta0),
                    _safe_ratio(eta0, eta1))
    wh = normalize(wo + wi * eta[..., None])
    wh_bad = ~jnp.all(jnp.isfinite(wh), axis=-1)
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    cosoh = dot(wo, wh)
    fr = fresnel_dielectric(cosoh, eta0, eta1)
    cosih = dot(wi, wh)
    sqrt_denom = cosoh + eta * cosih
    d = mf.distribution(dist, wh, alpha, alpha, dists)
    g = mf.visible_both(dist, wo, wi, alpha, alpha, dists)
    denom = (jnp.abs(frame.cos_theta(wo)) * jnp.abs(frame.cos_theta(wi))
             * sqrt_denom * sqrt_denom)
    val = c0 * _fin(d * g * (1.0 - fr) * jnp.abs(cosih)
                    * jnp.abs(cosoh)
                    / jnp.maximum(denom, 1e-20))[..., None]
    # eta == 1 degenerate: reference returns grey(1)
    val = jnp.where(wh_bad[..., None], 1.0, val)
    return jnp.where(same_side[..., None], 0.0, val)


def _ashikhmin_eval(c0, c1, alpha, dist, wo, wi, dists=None):
    """Ashikhmin-Shirley diffuse+gloss coat (ref: microfacet.rs:567-589).
    c0=diffuse, c1=specular."""
    wh_raw = wo + wi
    degen = (wh_raw[..., 0]**2 + wh_raw[..., 1]**2
             + wh_raw[..., 2]**2) < 1e-12
    wh = normalize(jnp.where(degen[..., None], vec3(
        jnp.ones_like(degen, jnp.float32), 0.0, 0.0), wh_raw))
    term_o = 1.0 - (1.0 - 0.5 * jnp.abs(frame.cos_theta(wo))) ** 5
    term_i = 1.0 - (1.0 - 0.5 * jnp.abs(frame.cos_theta(wi))) ** 5
    diffuse = (28.0 / (23.0 * PI)) * c0 * (1.0 - c1) \
        * (term_o * term_i)[..., None]
    d = mf.distribution(dist, wh, alpha, alpha, dists)
    cosih = dot(wi, wh)
    denom = 4.0 * jnp.abs(cosih) * jnp.maximum(
        jnp.abs(frame.cos_theta(wi)), jnp.abs(frame.cos_theta(wo)))
    spec = _fin(d / jnp.maximum(denom, 1e-20))[..., None] \
        * schlick_fresnel(cosih, c1)
    return jnp.where(degen[..., None], 0.0, diffuse + spec)


def slot_eval(stype, c0, c1, p0, p1, p2, dist, wo, wi, present=None,
              dist_sets=None):
    """f(wo, wi) for one slot column, all lanes.  stype [N]; colors
    [N,3]; scalars [N].  present: optional static type set — families
    not in it are never computed (materials.slot_presence);
    dist_sets: static per-family distribution sets."""
    zero = jnp.zeros_like(c0)
    fd = lambda *ts: _fam_dists(dist_sets, *ts)
    fams = (
        (T_LAMBERT_R, lambda: c0 * INV_PI),
        (T_LAMBERT_T, lambda: c0 * INV_PI),
        (T_OREN_NAYAR, lambda: _oren_nayar_eval(c0, p0, p1, wo, wi)),
        (T_TS_R, lambda: _ts_r_eval(c0, p0, p1, p2, dist, wo, wi,
                                    fd(T_TS_R))),
        (T_TS_T, lambda: _ts_t_eval(c0, p0, p1, p2, dist, wo, wi,
                                    fd(T_TS_T))),
        (T_ASHIKHMIN, lambda: _ashikhmin_eval(c0, c1, p0, dist, wo, wi,
                                              fd(T_ASHIKHMIN))),
    )
    out = zero
    for t, fn in fams:
        if present is not None and t not in present:
            continue
        out = jnp.where((stype == t)[..., None], fn(), out)
    return out


def _cos_pdf_same(wo, wi):
    return jnp.where(wo[..., 2] * wi[..., 2] > 0.0,
                     jnp.abs(frame.cos_theta(wi)) * INV_PI, 0.0)


def _cos_pdf_opposite(wo, wi):
    return jnp.where(wo[..., 2] * wi[..., 2] >= 0.0, 0.0,
                     jnp.abs(frame.cos_theta(wi)) * INV_PI)


def _ts_r_pdf(alpha, dist, wo, wi, dists=None):
    wh = normalize(wo + wi)
    pdf = mf.pdf_wh(dist, wo, wh, alpha, alpha, dists) \
        / (4.0 * dot(wo, wh))
    pdf = jnp.where(jnp.isfinite(pdf), pdf, 0.0)
    return jnp.where(wo[..., 2] * wi[..., 2] <= 0.0, 0.0, pdf)


def _ts_t_pdf(alpha, eta0, eta1, dist, wo, wi, dists=None):
    eta = jnp.where(wo[..., 2] > 0.0, _safe_ratio(eta1, eta0),
                    _safe_ratio(eta0, eta1))
    wh = normalize(wo + wi * eta[..., None])
    bad = ~jnp.all(jnp.isfinite(wh), axis=-1)
    sqrt_denom = dot(wo, wh) + eta * dot(wi, wh)
    dhdi = eta * eta * jnp.abs(dot(wi, wh)) / jnp.maximum(
        sqrt_denom * sqrt_denom, 1e-20)
    pdf = mf.pdf_wh(dist, wo, wh, alpha, alpha, dists) * dhdi
    pdf = jnp.where(bad, 1.0, pdf)
    return jnp.where(wo[..., 2] * wi[..., 2] > 0.0, 0.0, pdf)


def _ashikhmin_pdf(alpha, dist, wo, wi, dists=None):
    wh = normalize(wo + wi)
    p = mf.pdf_wh(dist, wo, wh, alpha, alpha, dists) \
        / (4.0 * dot(wo, wh))
    p = jnp.where(jnp.isfinite(p), p, 0.0)
    pdf = 0.5 * (p + jnp.abs(frame.cos_theta(wi)) * INV_PI)
    return jnp.where(wo[..., 2] * wi[..., 2] < 0.0, 0.0, pdf)


def slot_pdf(stype, p0, p1, p2, dist, wo, wi, present=None,
             dist_sets=None):
    zero = jnp.zeros(stype.shape, jnp.float32)
    fd = lambda *ts: _fam_dists(dist_sets, *ts)
    fams = (
        (T_LAMBERT_R, lambda: _cos_pdf_same(wo, wi)),
        (T_OREN_NAYAR, lambda: _cos_pdf_same(wo, wi)),
        (T_LAMBERT_T, lambda: _cos_pdf_opposite(wo, wi)),
        (T_TS_R, lambda: _ts_r_pdf(p0, dist, wo, wi, fd(T_TS_R))),
        (T_TS_T, lambda: _ts_t_pdf(p0, p1, p2, dist, wo, wi,
                                   fd(T_TS_T))),
        (T_ASHIKHMIN, lambda: _ashikhmin_pdf(p0, dist, wo, wi,
                                             fd(T_ASHIKHMIN))),
    )
    out = zero
    for t, fn in fams:
        if present is not None and t not in present:
            continue
        out = jnp.where(stype == t, fn(), out)
    return out




# ---------------------------------------------------------------------------
# fused per-slot evaluate + pdf: one wh/D/Lambda computation per family
# (the NEE branch and the mixture re-accumulation need both f and pdf;
# Mosaic performs no global CSE, so the separate slot_eval + slot_pdf
# sweeps duplicated the microfacet work inside the bounce kernel)
# ---------------------------------------------------------------------------

def _ts_r_eval_pdf(c0, alpha, eta0, eta1, dist, wo, wi, dists=None):
    wh = normalize(wo + wi)
    nanmask = ~jnp.all(jnp.isfinite(wh), axis=-1)
    d = mf.distribution(dist, wh, alpha, alpha, dists)
    g = mf.visible_both(dist, wo, wi, alpha, alpha, dists)
    fr = fresnel_dielectric(dot(wi, wh), eta0, eta1)
    denom = 4.0 * jnp.abs(wo[..., 2]) * jnp.abs(wi[..., 2])
    f = c0 * _fin(d * g * fr / jnp.maximum(denom, 1e-20))[..., None]
    f = jnp.where(nanmask[..., None], 0.0, f)
    pdf = d * mf.visible(dist, wo, alpha, alpha, dists) \
        * jnp.abs(dot(wo, wh)) \
        / jnp.maximum(jnp.abs(frame.cos_theta(wo)), 1e-20) \
        / (4.0 * dot(wo, wh))
    pdf = jnp.where(jnp.isfinite(pdf), pdf, 0.0)
    pdf = jnp.where(wo[..., 2] * wi[..., 2] <= 0.0, 0.0, pdf)
    return f, pdf


def _ts_t_eval_pdf(c0, alpha, eta0, eta1, dist, wo, wi, dists=None):
    same_side = wo[..., 2] * wi[..., 2] > 0.0
    eta = jnp.where(wo[..., 2] > 0.0, _safe_ratio(eta1, eta0),
                    _safe_ratio(eta0, eta1))
    wh = normalize(wo + wi * eta[..., None])
    wh_bad = ~jnp.all(jnp.isfinite(wh), axis=-1)
    whp = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    cosoh = dot(wo, whp)
    fr = fresnel_dielectric(cosoh, eta0, eta1)
    cosih = dot(wi, whp)
    sqrt_denom = cosoh + eta * cosih
    d = mf.distribution(dist, whp, alpha, alpha, dists)
    g = mf.visible_both(dist, wo, wi, alpha, alpha, dists)
    denom = (jnp.abs(frame.cos_theta(wo)) * jnp.abs(frame.cos_theta(wi))
             * sqrt_denom * sqrt_denom)
    val = c0 * _fin(d * g * (1.0 - fr) * jnp.abs(cosih)
                    * jnp.abs(cosoh)
                    / jnp.maximum(denom, 1e-20))[..., None]
    val = jnp.where(wh_bad[..., None], 1.0, val)
    f = jnp.where(same_side[..., None], 0.0, val)
    # pdf uses the UN-flipped half vector exactly like _ts_t_pdf
    cosoh_u = dot(wo, wh)
    cosih_u = dot(wi, wh)
    sqd_u = cosoh_u + eta * cosih_u
    dhdi = eta * eta * jnp.abs(cosih_u) / jnp.maximum(
        sqd_u * sqd_u, 1e-20)
    d_u = mf.distribution(dist, wh, alpha, alpha, dists)
    pdf = d_u * mf.visible(dist, wo, alpha, alpha, dists) \
        * jnp.abs(cosoh_u) \
        / jnp.maximum(jnp.abs(frame.cos_theta(wo)), 1e-20) * dhdi
    pdf = jnp.where(wh_bad, 1.0, pdf)
    pdf = jnp.where(wo[..., 2] * wi[..., 2] > 0.0, 0.0, pdf)
    return f, pdf


def _ashikhmin_eval_pdf(c0, c1, alpha, dist, wo, wi, dists=None):
    wh_raw = wo + wi
    degen = (wh_raw[..., 0]**2 + wh_raw[..., 1]**2
             + wh_raw[..., 2]**2) < 1e-12
    wh = normalize(jnp.where(degen[..., None], vec3(
        jnp.ones_like(degen, jnp.float32), 0.0, 0.0), wh_raw))
    term_o = 1.0 - (1.0 - 0.5 * jnp.abs(frame.cos_theta(wo))) ** 5
    term_i = 1.0 - (1.0 - 0.5 * jnp.abs(frame.cos_theta(wi))) ** 5
    diffuse = (28.0 / (23.0 * PI)) * c0 * (1.0 - c1) \
        * (term_o * term_i)[..., None]
    d = mf.distribution(dist, wh, alpha, alpha, dists)
    cosih = dot(wi, wh)
    denom = 4.0 * jnp.abs(cosih) * jnp.maximum(
        jnp.abs(frame.cos_theta(wi)), jnp.abs(frame.cos_theta(wo)))
    spec_f = _fin(d / jnp.maximum(denom, 1e-20))[..., None] \
        * schlick_fresnel(cosih, c1)
    f = jnp.where(degen[..., None], 0.0, diffuse + spec_f)
    # pdf over the normalized wh of the ORIGINAL sum (as _ashikhmin_pdf)
    wh_p = normalize(wo + wi)
    p = mf.distribution(dist, wh_p, alpha, alpha, dists) \
        * mf.visible(dist, wo, alpha, alpha, dists) \
        * jnp.abs(dot(wo, wh_p)) \
        / jnp.maximum(jnp.abs(frame.cos_theta(wo)), 1e-20) \
        / (4.0 * dot(wo, wh_p))
    p = jnp.where(jnp.isfinite(p), p, 0.0)
    pdf = 0.5 * (p + jnp.abs(frame.cos_theta(wi)) * INV_PI)
    pdf = jnp.where(wo[..., 2] * wi[..., 2] < 0.0, 0.0, pdf)
    return f, pdf


def slot_eval_pdf_fused(stype, c0, c1, p0, p1, p2, dist, wo, wi,
                        present=None, dist_sets=None):
    """(f, pdf) for one slot column in one family sweep, sharing the
    per-family microfacet work.  Exactly slot_eval + slot_pdf\'s math;
    the split functions remain the oracles
    (tests/test_bxdf.py::TestFusedEvalPdf)."""
    zero3 = jnp.zeros_like(c0)
    zero1 = jnp.zeros(stype.shape, jnp.float32)
    fd = lambda *ts: _fam_dists(dist_sets, *ts)
    fams = (
        (T_LAMBERT_R, lambda: (c0 * INV_PI, _cos_pdf_same(wo, wi))),
        (T_OREN_NAYAR, lambda: (_oren_nayar_eval(c0, p0, p1, wo, wi),
                                _cos_pdf_same(wo, wi))),
        (T_LAMBERT_T, lambda: (c0 * INV_PI, _cos_pdf_opposite(wo, wi))),
        (T_TS_R, lambda: _ts_r_eval_pdf(c0, p0, p1, p2, dist, wo, wi,
                                        fd(T_TS_R))),
        (T_TS_T, lambda: _ts_t_eval_pdf(c0, p0, p1, p2, dist, wo, wi,
                                        fd(T_TS_T))),
        (T_ASHIKHMIN, lambda: _ashikhmin_eval_pdf(
            c0, c1, p0, dist, wo, wi, fd(T_ASHIKHMIN))),
    )
    f_out = zero3
    p_out = zero1
    for t, fn in fams:
        if present is not None and t not in present:
            continue
        fv, pv = fn()
        m = stype == t
        f_out = jnp.where(m[..., None], fv, f_out)
        p_out = jnp.where(m, pv, p_out)
    return f_out, p_out


# ---------------------------------------------------------------------------
# per-slot sampling
# ---------------------------------------------------------------------------

def slot_sample(stype, c0, c1, p0, p1, p2, dist, wo, u, present=None,
                dist_sets=None):
    """Sample wi for one slot column; returns (f [N,3], wi [N,3],
    pdf [N], sampled_kind [N] int32).  u is the *raw* 2D sample, not
    remapped after slot selection (reference quirk).  present:
    optional static type set — families not in it are never emitted
    (materials.slot_presence)."""
    n = wo.shape[0]
    ux = u[..., 0]
    # Detached-sampling estimator: directions are constants w.r.t.
    # material parameters; f and pdf stay differentiable (SURVEY §7 M5).
    sg = jax.lax.stop_gradient

    def has(*ts):
        return present is None or any(t in present for t in ts)

    table = {}

    # --- cosine-hemisphere families -------------------------------------
    if has(T_LAMBERT_R, T_OREN_NAYAR, T_LAMBERT_T):
        from arendur_tpu.sampling.warps import sample_cosw_hemisphere
        wi_cos = sg(sample_cosw_hemisphere(u))
        # z-flips built by stacking (array constants cannot be captured
        # by the pallas_shade kernel)
        wi_cos_flip = jnp.stack(
            [wi_cos[..., 0], wi_cos[..., 1], -wi_cos[..., 2]], -1)
        wi_same = jnp.where((wo[..., 2] < 0.0)[..., None],
                            wi_cos_flip, wi_cos)
        wi_opp = jnp.where((wo[..., 2] > 0.0)[..., None],
                           wi_cos_flip, wi_cos)
        if has(T_LAMBERT_R):
            table[T_LAMBERT_R] = (
                c0 * INV_PI, wi_same, _cos_pdf_same(wo, wi_same),
                jnp.full((n,), KIND_OF_TYPE[T_LAMBERT_R], jnp.int32))
        if has(T_OREN_NAYAR):
            table[T_OREN_NAYAR] = (
                _oren_nayar_eval(c0, p0, p1, wo, wi_same), wi_same,
                _cos_pdf_same(wo, wi_same),
                jnp.full((n,), KIND_OF_TYPE[T_OREN_NAYAR], jnp.int32))
        if has(T_LAMBERT_T):
            table[T_LAMBERT_T] = (
                c0 * INV_PI, wi_opp, _cos_pdf_opposite(wo, wi_opp),
                jnp.full((n,), KIND_OF_TYPE[T_LAMBERT_T], jnp.int32))

    # --- mirror direction (fresnel + perfect specular families) ---------
    if has(T_FRESNEL_SPEC, T_SPECULAR_R, T_SPECULAR_T):
        cos_theta = frame.cos_theta(wo)
        wi_mirror = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)

    # --- fresnel specular (FresnelBxdf, fresnel.rs:166-197) -------------
    if has(T_FRESNEL_SPEC):
        fr = fresnel_dielectric(cos_theta, p0, p1)
        refl = ux < fr
        f_refl = _fin(fr / jnp.maximum(jnp.abs(cos_theta),
                                       1e-20))[..., None] * c0
        pdf_refl = fr
        entering = cos_theta > 0.0
        etai = jnp.where(entering, p0, p1)
        etao = jnp.where(entering, p1, p0)
        zsign = jnp.where(entering, 1.0, -1.0)
        zeros = jnp.zeros_like(zsign)
        nrm = jnp.stack([zeros, zeros, zsign], -1)
        eta_rel = _safe_ratio(etai, etao)
        wt, ok_t = frame.refract(wo, nrm, sg(eta_rel))
        wt = sg(wt)
        pdf_trans = 1.0 - fr
        f_trans = jnp.where(
            ok_t[..., None],
            c1 * _fin(eta_rel * eta_rel * pdf_trans
                      / jnp.maximum(jnp.abs(wt[..., 2]),
                                    1e-20))[..., None],
            0.0)
        table[T_FRESNEL_SPEC] = (
            jnp.where(refl[..., None], f_refl, f_trans),
            jnp.where(refl[..., None], wi_mirror, wt),
            jnp.where(refl, pdf_refl, pdf_trans),
            jnp.where(refl, REFLECTION | SPECULAR,
                      TRANSMISSION | SPECULAR))

    # --- Torrance-Sparrow reflection / transmission ----------------------
    fd = lambda *ts: _fam_dists(dist_sets, *ts)
    if has(T_TS_R, T_TS_T):
        wh_r = sg(mf.sample_wh(dist, wo, u, p0, p0,
                               fd(T_TS_R, T_TS_T)))
    if has(T_TS_R):
        wi_tsr = sg(normalize(
            2.0 * dot(wo, wh_r, keepdims=True) * wh_r - wo))
        pdf_tsr = mf.pdf_wh(dist, wo, wh_r, p0, p0, fd(T_TS_R)) \
            / (4.0 * dot(wo, wh_r))
        pdf_tsr = jnp.where(jnp.isfinite(pdf_tsr), pdf_tsr, 0.0)
        f_tsr = jnp.where(
            (wo[..., 2] * wi_tsr[..., 2] <= 0.0)[..., None],
            0.0, _ts_r_eval(c0, p0, p1, p2, dist, wo, wi_tsr,
                            fd(T_TS_R)))
        table[T_TS_R] = (f_tsr, wi_tsr, pdf_tsr,
                         jnp.full((n,), KIND_OF_TYPE[T_TS_R], jnp.int32))
    if has(T_TS_T):
        eta_tst = jnp.where(wo[..., 2] > 0.0, _safe_ratio(p1, p2),
                            _safe_ratio(p2, p1))
        wi_tst, ok_tst = frame.refract(wo, wh_r, sg(eta_tst))
        wi_tst = sg(wi_tst)
        pdf_tst = jnp.where(
            ok_tst, _ts_t_pdf(p0, p1, p2, dist, wo, wi_tst,
                              fd(T_TS_T)), 0.0)
        f_tst = jnp.where(
            ok_tst[..., None],
            _ts_t_eval(c0, p0, p1, p2, dist, wo, wi_tst,
                       fd(T_TS_T)), 0.0)
        table[T_TS_T] = (f_tst, wi_tst, pdf_tst,
                         jnp.full((n,), KIND_OF_TYPE[T_TS_T], jnp.int32))

    # --- Ashikhmin-Shirley 50/50 mixture --------------------------------
    if has(T_ASHIKHMIN):
        from arendur_tpu.sampling.warps import sample_cosw_hemisphere
        spec_path = ux < 0.5
        # clip remapped samples into [0,1): the remap is only *used* on
        # its own branch, but it is *computed* for every lane, and
        # out-of-range u feeds sqrt(-log(u)) NaNs into sample_wh
        u_spec = jnp.stack(
            [jnp.clip(ux * 2.0, 0.0, 0.999999), u[..., 1]], axis=-1)
        u_diff = jnp.stack(
            [jnp.clip((1.0 - ux) * 2.0, 0.0, 0.999999), u[..., 1]],
            axis=-1)
        wh_a = sg(mf.sample_wh(dist, wo, u_spec, p0, p0,
                               fd(T_ASHIKHMIN)))
        wi_as = sg(normalize(
            2.0 * dot(wo, wh_a, keepdims=True) * wh_a - wo))
        wi_ad_raw = sample_cosw_hemisphere(u_diff)
        wi_ad = jnp.where((wi_ad_raw[..., 2] < 0.0)[..., None],
                          jnp.stack([wi_ad_raw[..., 0], wi_ad_raw[..., 1],
                                     -wi_ad_raw[..., 2]], -1),
                          wi_ad_raw)
        wi_ash = jnp.where(spec_path[..., None], wi_as, wi_ad)
        bad_spec = spec_path & (wo[..., 2] * wi_ash[..., 2] <= 0.0)
        pdf_ash = _ashikhmin_pdf(p0, dist, wo, wi_ash, fd(T_ASHIKHMIN))
        f_ash = jnp.where(bad_spec[..., None], 0.0,
                          _ashikhmin_eval(c0, c1, p0, dist, wo, wi_ash,
                                          fd(T_ASHIKHMIN)))
        table[T_ASHIKHMIN] = (
            f_ash, wi_ash, pdf_ash,
            jnp.full((n,), KIND_OF_TYPE[T_ASHIKHMIN], jnp.int32))

    # --- perfect specular R / T (specular.rs) ---------------------------
    if has(T_SPECULAR_R, T_SPECULAR_T):
        cos_r = frame.cos_theta(wi_mirror)
        fr_sr = fresnel_dielectric(cos_r, p0, p1)
        inv_c = _fin(1.0 / jnp.maximum(jnp.abs(cos_r), 1e-20))
        if has(T_SPECULAR_R):
            table[T_SPECULAR_R] = (
                (fr_sr * inv_c)[..., None] * c0, wi_mirror,
                jnp.ones((n,), jnp.float32),
                jnp.full((n,), KIND_OF_TYPE[T_SPECULAR_R], jnp.int32))
        if has(T_SPECULAR_T):
            table[T_SPECULAR_T] = (
                ((1.0 - fr_sr) * inv_c)[..., None] * c0, wi_mirror,
                jnp.ones((n,), jnp.float32),
                jnp.full((n,), KIND_OF_TYPE[T_SPECULAR_T], jnp.int32))

    # --- select by slot type --------------------------------------------
    fv = jnp.zeros((n, 3), jnp.float32)
    wiv = jnp.stack([jnp.zeros((n,)), jnp.ones((n,)),
                     jnp.zeros((n,))], -1).astype(jnp.float32)
    pv = jnp.zeros((n,), jnp.float32)
    kv = jnp.zeros((n,), jnp.int32)
    for t, (f_, wi_, p_, k_) in table.items():
        m = stype == t
        fv = jnp.where(m[..., None], f_, fv)
        wiv = jnp.where(m[..., None], wi_, wiv)
        pv = jnp.where(m, p_, pv)
        kv = jnp.where(m, k_, kv)
    return fv, wiv, pv, kv


# ---------------------------------------------------------------------------
# BSDF-level mixture (ref: bsdf.rs)
# ---------------------------------------------------------------------------

def _to_local(b: BsdfSlots, v):
    return frame.to_local(b.ts, b.bs, b.ns, v)


def _to_world(b: BsdfSlots, v):
    return frame.to_world(b.ts, b.bs, b.ns, v)


def _col3(arr, k: int):
    """Slot column of a color array in either layout: [N,K,3] (the
    standard pytree layout) or [N,3K] flattened (the Pallas kernels
    keep everything 2-D — Mosaic has no 3-D reshape)."""
    if arr.ndim == 3:
        return arr[:, k]
    return arr[:, 3 * k:3 * (k + 1)]


def _slot_col(b: BsdfSlots, k: int):
    return (b.type[:, k], _col3(b.c0, k), _col3(b.c1, k), b.p0[:, k],
            b.p1[:, k], b.p2[:, k], b.dist[:, k])


def match_count(b: BsdfSlots, types: int = ALL):
    """#slots whose kind intersects `types` (ref: bsdf.rs:52-62)."""
    m = (b.kind & types) != 0
    return jnp.sum(m.astype(jnp.int32), axis=-1)


def bsdf_evaluate(b: BsdfSlots, wow, wiw, types: int = ALL):
    """Sum matching slots with reflect/transmit classification
    (ref: bsdf.rs:82-98).  Returns (f [N,3], kinds [N] int32)."""
    wo = normalize(_to_local(b, wow))
    wi = normalize(_to_local(b, wiw))
    is_refl = dot(wow, b.ng) * dot(wiw, b.ng) > 0.0
    f = jnp.zeros(wow.shape, jnp.float32)
    kinds = jnp.zeros(wow.shape[:-1], jnp.int32)
    for k in range(b.nslots):
        pres = b.col_present(k)
        if pres is not None and len(pres) == 0:
            continue
        stype, c0, c1, p0, p1, p2, dist = _slot_col(b, k)
        kindk = b.kind[:, k]
        # boolean algebra instead of where-on-bool: Mosaic cannot
        # truncate 1-D i8 selects back to i1
        sel = ((kindk & types) != 0) & (
            (is_refl & ((kindk & REFLECTION) != 0))
            | (~is_refl & ((kindk & TRANSMISSION) != 0)))
        fk = slot_eval(stype, c0, c1, p0, p1, p2, dist, wo, wi,
                       present=pres, dist_sets=b.dists)
        f = f + jnp.where(sel[..., None], fk, 0.0)
        kinds = kinds | jnp.where(sel, kindk & types, 0)
    return f, kinds


def bsdf_pdf(b: BsdfSlots, wow, wiw, types: int = ALL):
    """Mean pdf over matching slots (ref: bsdf.rs:205-222)."""
    wo = normalize(_to_local(b, wow))
    wi = normalize(_to_local(b, wiw))
    total = jnp.zeros(wow.shape[:-1], jnp.float32)
    count = jnp.zeros(wow.shape[:-1], jnp.int32)
    for k in range(b.nslots):
        pres = b.col_present(k)
        if pres is not None and len(pres) == 0:
            continue
        stype, c0, c1, p0, p1, p2, dist = _slot_col(b, k)
        m = (b.kind[:, k] & types) != 0
        pk = slot_pdf(stype, p0, p1, p2, dist, wo, wi, present=pres,
                      dist_sets=b.dists)
        total = total + jnp.where(m, jnp.maximum(pk, 0.0), 0.0)
        count = count + m.astype(jnp.int32)
    pdf = jnp.where(count > 0, total / jnp.maximum(count, 1), total)
    return jnp.where(wo[..., 2] == 0.0, 0.0, pdf)


def bsdf_eval_pdf(b: BsdfSlots, wow, wiw, types: int = ALL):
    """Fused bsdf_evaluate + bsdf_pdf in ONE slot sweep (the NEE
    light branch needs both, scene.rs:96-125; separate sweeps doubled
    the per-bounce shading op count on TPU, where every op carries a
    fixed dispatch cost).  Returns (f [N,3], pdf [N])."""
    wo = normalize(_to_local(b, wow))
    wi = normalize(_to_local(b, wiw))
    is_refl = dot(wow, b.ng) * dot(wiw, b.ng) > 0.0
    f = jnp.zeros(wow.shape, jnp.float32)
    total = jnp.zeros(wow.shape[:-1], jnp.float32)
    count = jnp.zeros(wow.shape[:-1], jnp.int32)
    for k in range(b.nslots):
        pres = b.col_present(k)
        if pres is not None and len(pres) == 0:
            continue
        stype, c0, c1, p0, p1, p2, dist = _slot_col(b, k)
        kindk = b.kind[:, k]
        m = (kindk & types) != 0
        sel = m & ((is_refl & ((kindk & REFLECTION) != 0))
                   | (~is_refl & ((kindk & TRANSMISSION) != 0)))
        fk, pk = slot_eval_pdf_fused(
            stype, c0, c1, p0, p1, p2, dist, wo, wi, present=pres,
            dist_sets=b.dists)
        f = f + jnp.where(sel[..., None], fk, 0.0)
        total = total + jnp.where(m, jnp.maximum(pk, 0.0), 0.0)
        count = count + m.astype(jnp.int32)
    pdf = jnp.where(count > 0, total / jnp.maximum(count, 1), total)
    pdf = jnp.where(wo[..., 2] == 0.0, 0.0, pdf)
    return f, pdf


def bsdf_sample(b: BsdfSlots, wow, u, types: int = ALL):
    """Mixture sampling (ref: bsdf.rs:100-144).

    Returns (f [N,3], wiw [N,3], pdf [N], sampled_kind [N] int32).
    """
    n = wow.shape[0]
    nmatch = match_count(b, types)
    wo = normalize(_to_local(b, wow))

    idx = jnp.minimum(
        (u[..., 0] * nmatch.astype(jnp.float32)).astype(jnp.int32),
        jnp.maximum(nmatch - 1, 0))

    # gather the idx-th *matching* slot's parameters per lane
    running = jnp.zeros((n,), jnp.int32)
    sel_k = jnp.zeros((n,), jnp.int32)
    for k in range(b.nslots):
        m = (b.kind[:, k] & types) != 0
        hit_here = m & (running == idx)
        sel_k = jnp.where(hit_here, k, sel_k)
        running = running + m.astype(jnp.int32)
    # unrolled per-column select: K is tiny and static, and a where
    # chain is pure elementwise (fuses; take_along_axis lowers to a
    # gather, ~0.25 ms per call on the HBM-bound wavefront)
    def take(arr):
        out = arr[:, 0]
        for k in range(1, b.nslots):
            out = jnp.where(sel_k == k, arr[:, k], out)
        return out

    def take3(arr):
        out = _col3(arr, 0)
        for k in range(1, b.nslots):
            out = jnp.where((sel_k == k)[:, None], _col3(arr, k), out)
        return out
    stype = take(b.type)
    f, wi, pdf, skind = slot_sample(
        stype, take3(b.c0), take3(b.c1), take(b.p0), take(b.p1),
        take(b.p2), take(b.dist), wo, u, present=b.any_present(),
        dist_sets=b.dists)
    skind = skind & types
    is_spec = (take(b.kind) & SPECULAR) != 0

    wiw = _to_world(b, wi)

    # multi-slot non-specular: re-accumulate f and average pdf over
    # slots matching the sampled kind (ref: bsdf.rs:129-143).  When the
    # material table can never place more than one slot, the whole
    # re-accumulation is statically dead.
    if b.present is not None and \
            sum(1 for c in b.present if len(c) > 0) <= 1:
        dead = (nmatch == 0) | (pdf == 0.0)
        f_out = jnp.where(dead[..., None], 0.0, f)
        pdf_out = jnp.where(dead, 0.0, pdf)
        skind = jnp.where(dead, 0, skind)
        return f_out, wiw, pdf_out, skind
    multi = (nmatch > 1) & ~is_spec
    is_refl = dot(wow, b.ng) * dot(wiw, b.ng) > 0.0
    f_acc = jnp.zeros((n, 3), jnp.float32)
    pdf_acc = jnp.zeros((n,), jnp.float32)
    for k in range(b.nslots):
        pres = b.col_present(k)
        if pres is not None and len(pres) == 0:
            continue
        stype_k, c0, c1, p0, p1, p2, dist = _slot_col(b, k)
        kindk = b.kind[:, k]
        sel = ((kindk & skind) != 0) & (
            (is_refl & ((kindk & REFLECTION) != 0))
            | (~is_refl & ((kindk & TRANSMISSION) != 0)))
        fk, pk = slot_eval_pdf_fused(
            stype_k, c0, c1, p0, p1, p2, dist, wo, wi, present=pres,
            dist_sets=b.dists)
        f_acc = f_acc + jnp.where(sel[..., None], fk, 0.0)
        pdf_acc = pdf_acc + jnp.where(sel, jnp.maximum(pk, 0.0), 0.0)
    f_out = jnp.where(multi[..., None], f_acc, f)
    pdf_out = jnp.where(
        multi, pdf_acc / jnp.maximum(nmatch.astype(jnp.float32), 1.0), pdf)

    # no matching slots or zero pdf from the chosen slot -> dead sample
    dead = (nmatch == 0) | (pdf == 0.0)
    f_out = jnp.where(dead[..., None], 0.0, f_out)
    pdf_out = jnp.where(dead, 0.0, pdf_out)
    skind = jnp.where(dead, 0, skind)
    return f_out, wiw, pdf_out, skind


def rho_hd(b: BsdfSlots, wow, samples, types: int = ALL):
    """Monte-Carlo hemispherical-directional albedo
    (ref: bxdf/mod.rs:87-99): rho ~= mean f(wo, wi)|cos wi| / pdf over
    sampled wi.  samples: [S, N, 2]."""
    n = wow.shape[0]
    acc = jnp.zeros((n, 3), jnp.float32)
    for s in range(samples.shape[0]):
        f, wiw, pdf, _ = bsdf_sample(b, wow, samples[s], types)
        wi = normalize(_to_local(b, wiw))
        term = f * (jnp.abs(frame.cos_theta(wi))
                    / jnp.maximum(pdf, 1e-20))[..., None]
        acc = acc + jnp.where((pdf > 0.0)[..., None], term, 0.0)
    return acc / samples.shape[0]


def rho_hh(b: BsdfSlots, samples1, samples2, types: int = ALL):
    """Monte-Carlo hemispherical-hemispherical albedo
    (ref: bxdf/mod.rs:101-116): uniform wo x sampled wi.
    samples1/samples2: [S, N, 2]."""
    from arendur_tpu.sampling.warps import (
        sample_uniform_hemisphere, pdf_uniform_hemisphere)
    n = samples1.shape[1]
    acc = jnp.zeros((n, 3), jnp.float32)
    for s in range(samples1.shape[0]):
        wo = sample_uniform_hemisphere(samples1[s])
        wow = _to_world(b, wo)
        f, wiw, pdf, _ = bsdf_sample(b, wow, samples2[s], types)
        wi = normalize(_to_local(b, wiw))
        term = f * (jnp.abs(frame.cos_theta(wi))
                    * jnp.abs(frame.cos_theta(wo))
                    / jnp.maximum(pdf * pdf_uniform_hemisphere(),
                                  1e-20))[..., None]
        acc = acc + jnp.where((pdf > 0.0)[..., None], term, 0.0)
    return acc / (PI * samples1.shape[0])
