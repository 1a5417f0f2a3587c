"""Fresnel reflectance (ref: src/bxdf/fresnel.rs)."""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_theta_i, etai, etat):
    """Exact dielectric Fresnel (ref: fresnel.rs:16-37).  Batched;
    handles rays arriving from either side by swapping etas."""
    entering = cos_theta_i >= 0.0
    ei = jnp.where(entering, etai, etat)
    et = jnp.where(entering, etat, etai)
    ci = jnp.abs(cos_theta_i)
    sin2_i = jnp.maximum(1.0 - ci * ci, 0.0)
    # zero-filled (inactive) slots feed eta=0/0 through here; clamp so
    # unselected-branch primals stay finite for reverse-mode.  The
    # magnitude clamp matters too: |eta| ~ 1e20 makes eta^2 overflow to
    # inf and eta^2 * sin2_i(=0) a NaN that ESCAPES the total-internal-
    # reflection select (NaN >= 1.0 is False), poisoning gradients.
    eta = ei / jnp.where(jnp.abs(et) < 1e-20, 1e-20, et)
    eta = jnp.clip(eta, -1e3, 1e3)
    sin2_t = eta * eta * sin2_i
    total = sin2_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    etci = et * ci
    eict = ei * ct
    r_para = (etci - eict) / jnp.where(
        jnp.abs(etci + eict) < 1e-20, 1e-20, etci + eict)
    eici = ei * ci
    etct = et * ct
    r_perp = (eici - etct) / jnp.where(
        jnp.abs(eici + etct) < 1e-20, 1e-20, eici + etct)
    fr = 0.5 * (r_para * r_para + r_perp * r_perp)
    return jnp.where(total, 1.0, fr)


def fresnel_conductor(cos_theta_i, etai, etat, k):
    """Conductor Fresnel, reproducing the reference formula including
    its author-flagged approximation ("FIXME: wrong", fresnel.rs:59-66).
    etai/etat/k are [..., 3] spectra."""
    ci = jnp.abs(cos_theta_i)[..., None]
    sin2 = 1.0 - ci * ci
    cos2 = ci * ci
    sin4 = sin2 * sin2
    eta = etat / etai
    eta2 = eta * eta
    k2 = k * k
    tmp0 = eta2 - k2 - sin2
    a2pb2 = jnp.sqrt(jnp.maximum(tmp0 * tmp0 + 4.0 * eta2 * k2, 0.0))
    am2 = jnp.sqrt(jnp.maximum(a2pb2 * 2.0, 0.0))
    r_perp = (a2pb2 + cos2 - am2 * ci) / (a2pb2 + cos2 + am2 * ci)
    tmpa = a2pb2 * cos2
    tmpb = am2 * ci * sin2 + sin4
    r_para = r_perp * (tmpa - tmpb) / (tmpa + tmpb)
    return 0.5 * (r_para * r_para + r_perp * r_perp)


def schlick_fresnel(cost, s):
    """Schlick approximation used by Ashikhmin-Shirley
    (ref: microfacet.rs:626-629)."""
    return s + ((1.0 - cost) ** 5)[..., None] * (1.0 - s)
