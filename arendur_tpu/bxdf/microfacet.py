"""Microfacet distributions: Beckmann + Trowbridge-Reitz with
visible-normal sampling (ref: src/bxdf/microfacet.rs).

All functions are batched over [...] lanes and take a `dist` id array
selecting Beckmann (0) or Trowbridge (1) per lane — the slot-table
equivalent of the reference's generic `M: MicrofacetDistribution`
parameter.  Only isotropic alpha (ax == ay) is exercised by the
reference's materials, but the formulas keep ax/ay separate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arendur_tpu.geometry import frame
from arendur_tpu.geometry.vec import vec3, dot, normalize
from arendur_tpu.bxdf.types import D_BECKMANN, D_TROWBRIDGE

PI = float(jnp.pi)

# reproduce the reference's missing sqrt in Trowbridge slope sampling
# (see note in _sample_wh_trowbridge_oneside)
TR_COMPAT_NO_SQRT = False


def roughness_to_alpha(roughness):
    """pbrt polynomial (ref: microfacet.rs:57-63)."""
    x = jnp.log(jnp.maximum(roughness, 1e-3))
    return (1.62142 + 0.819955 * x + 0.1734 * x * x
            + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)


def _d_beckmann(wh, ax, ay):
    cos2 = frame.cos2_theta(wh)
    tan2 = frame.tan2_theta(wh)
    cos2p = frame.cos2_phi(wh)
    sin2p = frame.sin2_phi(wh)
    # clamp the exponent: at grazing wh the raw exponent underflows
    # exp() to 0 while its derivative factor is huge — 0 * inf = NaN in
    # reverse-mode.  jnp.maximum zeroes the derivative when clamped.
    expo = jnp.maximum(
        -tan2 * (cos2p / (ax * ax) + sin2p / (ay * ay)), -60.0)
    val = jnp.exp(expo) / jnp.maximum(PI * ax * ay * cos2 * cos2, 1e-30)
    return jnp.where(jnp.isfinite(val), val, 0.0)


def _d_trowbridge(wh, ax, ay):
    cos2 = frame.cos2_theta(wh)
    tan2 = frame.tan2_theta(wh)
    cos2p = frame.cos2_phi(wh)
    sin2p = frame.sin2_phi(wh)
    last = jnp.minimum(
        1.0 + tan2 * (cos2p / (ax * ax) + sin2p / (ay * ay)), 1e15)
    val = 1.0 / jnp.maximum(PI * ax * ay * cos2 * cos2 * last * last,
                            1e-30)
    return jnp.where(jnp.isfinite(tan2) & jnp.isfinite(val), val, 0.0)


def distribution(dist, wh, ax, ay, dists=None):
    """dists: optional static tuple of the D_* values that can occur
    (materials.dist_presence) — single-member sets skip the other
    model entirely (masked SIMD work is only free if never emitted)."""
    if dists is not None and tuple(dists) == (D_BECKMANN,):
        return _d_beckmann(wh, ax, ay)
    if dists is not None and tuple(dists) == (D_TROWBRIDGE,):
        return _d_trowbridge(wh, ax, ay)
    return jnp.where(dist == D_BECKMANN,
                     _d_beckmann(wh, ax, ay), _d_trowbridge(wh, ax, ay))


def _lambda_beckmann(w, ax, ay):
    tant = jnp.abs(frame.tan_theta(w))
    alpha = jnp.sqrt(frame.cos2_phi(w) * ax * ax
                     + frame.sin2_phi(w) * ay * ay)
    a = 1.0 / jnp.maximum(alpha * tant, 1e-20)
    poly = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    val = jnp.where(a >= 1.6, 0.0, poly)
    return jnp.where(jnp.isfinite(tant), val, 0.0)


def _lambda_trowbridge(w, ax, ay):
    tabs = jnp.abs(frame.tan_theta(w))
    alpha = jnp.sqrt(frame.cos2_phi(w) * ax * ax
                     + frame.sin2_phi(w) * ay * ay)
    term = jnp.minimum(alpha * tabs, 1e15)
    val = 0.5 * (-1.0 + jnp.sqrt(1.0 + term * term))
    return jnp.where(jnp.isfinite(tabs), val, 0.0)


def lam(dist, w, ax, ay, dists=None):
    if dists is not None and tuple(dists) == (D_BECKMANN,):
        return _lambda_beckmann(w, ax, ay)
    if dists is not None and tuple(dists) == (D_TROWBRIDGE,):
        return _lambda_trowbridge(w, ax, ay)
    return jnp.where(dist == D_BECKMANN,
                     _lambda_beckmann(w, ax, ay),
                     _lambda_trowbridge(w, ax, ay))


def visible(dist, w, ax, ay, dists=None):
    return 1.0 / (1.0 + lam(dist, w, ax, ay, dists))


def visible_both(dist, w0, w1, ax, ay, dists=None):
    return 1.0 / (1.0 + lam(dist, w0, ax, ay, dists)
                  + lam(dist, w1, ax, ay, dists))


def pdf_wh(dist, wo, wh, ax, ay, dists=None):
    """ref: microfacet.rs:49-52 (visible-normal pdf)."""
    return (distribution(dist, wh, ax, ay, dists)
            * visible(dist, wo, ax, ay, dists)
            * jnp.abs(dot(wo, wh))
            / jnp.maximum(jnp.abs(frame.cos_theta(wo)), 1e-20))


def erf(x):
    """A&S 7.1.26 approximation (ref: microfacet.rs:345-365)."""
    sign = jnp.sign(x)
    x = jnp.abs(x)
    a1, a2, a3 = 0.254829592, -0.28449673, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    t = 1.0 / (1.0 + p * x)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t \
        * jnp.exp(-x * x)
    return sign * y


def erf_inv(x):
    """pbrt polynomial (ref: microfacet.rs:313-341)."""
    x = jnp.clip(x, -0.99999, 0.99999)
    w = -jnp.log((1.0 - x) * (1.0 + x))
    w_lo = w - 2.5
    p_lo = 2.81022636e-08
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
              0.00021858087, -0.00125372503, -0.00417768164,
              0.246640727, 1.50140941):
        p_lo = c + p_lo * w_lo
    w_hi = jnp.sqrt(jnp.maximum(w, 1e-6)) - 3.0
    p_hi = -0.000200214257
    for c in (0.000100950558, 0.00134934322, -0.00367342844,
              0.00573950773, -0.0076224613, 0.00943887047,
              1.00167406, 2.83297682):
        p_hi = c + p_hi * w_hi
    return jnp.where(w < 5.0, p_lo, p_hi) * x


def acos_pos(x):
    """acos for x in [0, 1] (A&S 4.4.45 polynomial, max err ~7e-5 rad).

    Mosaic has no acos lowering; sharing this approximation between
    the XLA and Pallas shade paths keeps them bit-identical.  Only fed
    into the Beckmann CDF fit polynomial, where 7e-5 rad is far below
    the fit's own error."""
    x = jnp.clip(x, 0.0, 1.0)
    p = -0.0187293
    for c in (0.0742610, -0.2121144, 1.5707288):
        p = c + p * x
    return p * jnp.sqrt(1.0 - x)


def _sample_wh_beckmann(wo, u, ax, ay):
    """Visible-normal Beckmann sampling with Newton/bisection solve
    (ref: microfacet.rs:181-258), vectorized with masked updates."""
    wo_st = normalize(vec3(ax * wo[..., 0], ay * wo[..., 1], wo[..., 2]))
    cos_t = jnp.abs(frame.cos_theta(wo_st))
    ux = u[..., 0]
    uy = u[..., 1]

    # near-normal branch (u clamped into [0,1) by callers; the max
    # below keeps the log finite either way)
    r_n = jnp.sqrt(jnp.maximum(-jnp.log(jnp.maximum(ux, 1e-20)), 0.0))
    phi_n = 2.0 * PI * uy
    sx_n = r_n * jnp.cos(phi_n)
    sy_n = r_n * jnp.sin(phi_n)

    # general branch: solve erf-based CDF by safeguarded Newton
    cos_ts = jnp.clip(cos_t, 1e-6, 0.9999)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_ts * cos_ts, 0.0))
    tan_t = sin_t / cos_ts
    cot_t = cos_ts / jnp.maximum(sin_t, 1e-12)
    uxs = jnp.maximum(ux, 1e-6)
    theta = acos_pos(cos_ts)
    fit = 1.0 + theta * (-0.876 + theta * (0.4265 - 0.0594 * theta))
    sqrt_pi_inv = 1.0 / jnp.sqrt(PI)
    c0 = erf(cot_t)
    b = c0 - (1.0 + c0) * jnp.maximum(1.0 - uxs, 1e-10) ** fit
    norm = 1.0 / (1.0 + c0 + sqrt_pi_inv * tan_t * jnp.exp(-cot_t * cot_t))

    def newton_body(_, carry):
        a, b, c = carry
        b = jnp.where((b < a) | (b > c), 0.5 * (a + c), b)
        inv = erf_inv(b)
        value = norm * (1.0 + b + sqrt_pi_inv * tan_t
                        * jnp.exp(-inv * inv)) - uxs
        deriv = norm * (1.0 - inv * tan_t)
        c_new = jnp.where(value > 0.0, b, c)
        a_new = jnp.where(value > 0.0, a, b)
        b_new = b - value / jnp.where(deriv == 0.0, 1.0, deriv)
        done = jnp.abs(value) < 1e-5
        return (jnp.where(done, a, a_new), jnp.where(done, b, b_new),
                jnp.where(done, c, c_new))

    a0 = jnp.full_like(b, -1.0)
    _, b, _ = jax.lax.fori_loop(0, 9, newton_body, (a0, b, c0))
    sx_g = erf_inv(b)
    sy_g = erf_inv(2.0 * jnp.maximum(uy, 1e-6) - 1.0)

    near = cos_t > 0.9999
    sx = jnp.where(near, sx_n, sx_g)
    sy = jnp.where(near, sy_n, sy_g)

    cphi = frame.cos_phi(wo_st)
    sphi = frame.sin_phi(wo_st)
    sx, sy = cphi * sx - sphi * sy, sphi * sx + cphi * sy
    sx = sx * ax
    sy = sy * ay
    wh = normalize(vec3(-sx, -sy, jnp.ones_like(sx)))
    return wh * jnp.sign(wo[..., 2])[..., None]


def _sample_wh_trowbridge_oneside(wo, u, ax, ay):
    """ref: microfacet.rs:260-309 (wo.z > 0 assumed)."""
    wo_st = normalize(vec3(ax * wo[..., 0], ay * wo[..., 1], wo[..., 2]))
    cos_t = jnp.abs(frame.cos_theta(wo_st))
    ux = u[..., 0]
    uy = u[..., 1]

    r_n = jnp.sqrt(ux / jnp.maximum(1.0 - ux, 1e-20))
    phi_n = 2.0 * PI * uy
    sx_n = r_n * jnp.cos(phi_n)
    sy_n = r_n * jnp.sin(phi_n)

    cos_ts = jnp.clip(cos_t, 1e-6, 0.9999)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_ts * cos_ts, 0.0))
    tan_t = sin_t / cos_ts
    cot_t = cos_ts / jnp.maximum(sin_t, 1e-12)
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (cot_t * cot_t)))
    a = 2.0 * uy / g1 - 1.0
    denom = a * a - 1.0
    tmp = jnp.minimum(
        1.0 / jnp.where(denom == 0.0, 1e-20, denom), 1e10)
    d = jnp.sqrt(jnp.maximum(
        tan_t * tan_t * tmp * tmp - (a * a - tan_t * tan_t) * tmp, 0.0))
    sx1 = tan_t * tmp - d
    sx2 = tan_t * tmp + d
    sx_g = jnp.where((a < 0.0) | (sx2 > cot_t), sx1, sx2)

    s = jnp.where(uy > 0.5, 1.0, -1.0)
    uy2 = jnp.where(uy > 0.5, 2.0 * (uy - 0.5), 2.0 * (0.5 - uy))
    z = (uy2 * (uy2 * (uy2 * 0.27385 - 0.73369) + 0.46341)) / (
        uy2 * (uy2 * (uy2 * 0.093073 + 0.309420) - 1.0) + 0.597999)
    # The reference writes (1 + sx^2) where pbrt has sqrt(1 + sx^2)
    # (microfacet.rs:298) — that makes its TR sampler inconsistent with
    # its own pdf (verified numerically: mean sampled cos 0.775 vs
    # pdf-implied 0.822 at alpha=0.5).  We default to the consistent
    # sqrt form; set TR_COMPAT_NO_SQRT for bit-faithful reference
    # behavior.
    if TR_COMPAT_NO_SQRT:
        sy_g = s * z * (1.0 + sx_g * sx_g)
    else:
        sy_g = s * z * jnp.sqrt(1.0 + sx_g * sx_g)

    near = cos_t > 0.9999
    sx = jnp.where(near, sx_n, sx_g)
    sy = jnp.where(near, sy_n, sy_g)

    cphi = frame.cos_phi(wo_st)
    sphi = frame.sin_phi(wo_st)
    sx, sy = cphi * sx - sphi * sy, sphi * sx + cphi * sy
    sx = sx * ax
    sy = sy * ay
    return normalize(vec3(-sx, -sy, jnp.ones_like(sx)))


def _sample_wh_trowbridge(wo, u, ax, ay):
    """Handles wo.z < 0 by mirroring (ref: microfacet.rs:173-178)."""
    flip = wo[..., 2] < 0.0
    won = jnp.where(flip[..., None], -wo, wo)
    wh = _sample_wh_trowbridge_oneside(won, u, ax, ay)
    return jnp.where(flip[..., None], -wh, wh)


def sample_wh(dist, wo, u, ax, ay, dists=None):
    if dists is not None and tuple(dists) == (D_BECKMANN,):
        return _sample_wh_beckmann(wo, u, ax, ay)
    if dists is not None and tuple(dists) == (D_TROWBRIDGE,):
        return _sample_wh_trowbridge(wo, u, ax, ay)
    return jnp.where((dist == D_BECKMANN)[..., None],
                     _sample_wh_beckmann(wo, u, ax, ay),
                     _sample_wh_trowbridge(wo, u, ax, ay))
