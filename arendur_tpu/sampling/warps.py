"""Warp functions and MIS heuristics (ref: src/sample/mod.rs:132-254).

All take u as a [..., 2] uniform sample and broadcast over leading
axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from arendur_tpu.geometry.vec import vec3

PI = float(jnp.pi)
INV_PI = 1.0 / PI


def sample_uniform_hemisphere(u):
    """ref: sample/mod.rs:132-137 (note: reference uses costheta=u.x and
    sintheta=sqrt(max(1-costheta, 0)) — we keep its exact formula)."""
    costheta = u[..., 0]
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta, 0.0))
    phi = 2.0 * PI * u[..., 1]
    return vec3(sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta)


def pdf_uniform_hemisphere():
    return 0.5 * INV_PI


def sample_uniform_sphere(u):
    costheta = 1.0 - 2.0 * u[..., 0]
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta * costheta, 0.0))
    phi = 2.0 * PI * u[..., 1]
    return vec3(sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta)


def pdf_uniform_sphere():
    return 0.25 * INV_PI


def sample_concentric_disk(u):
    """Concentric disk warp (ref: sample/mod.rs:165-177)."""
    ux = 2.0 * u[..., 0] - 1.0
    uy = 2.0 * u[..., 1] - 1.0
    at_origin = (ux == 0.0) & (uy == 0.0)
    x_bigger = jnp.abs(ux) > jnp.abs(uy)
    safe_ux = jnp.where(ux == 0.0, 1.0, ux)
    safe_uy = jnp.where(uy == 0.0, 1.0, uy)
    r = jnp.where(x_bigger, ux, uy)
    theta = jnp.where(
        x_bigger,
        (PI / 4.0) * (uy / safe_ux),
        (PI / 2.0) - (PI / 4.0) * (ux / safe_uy))
    p = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(at_origin[..., None], 0.0, p)


def sample_uniform_disk(u):
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_cosw_hemisphere(u):
    """Cosine-weighted hemisphere via concentric disk
    (ref: sample/mod.rs:203-207)."""
    d = sample_concentric_disk(u)
    z = jnp.sqrt(jnp.abs(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return vec3(d[..., 0], d[..., 1], z)


def pdf_cosw_hemisphere(cos_theta):
    return cos_theta * INV_PI


def sample_uniform_cone(u, cos_max):
    costheta = (1.0 - u[..., 0]) + u[..., 0] * cos_max
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta * costheta, 0.0))
    phi = 2.0 * PI * u[..., 1]
    return vec3(sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta)


def pdf_uniform_cone(cos_max):
    return 1.0 / ((1.0 - cos_max) * 2.0 * PI)


def sample_uniform_triangle(u):
    """Uniform barycentrics (x, y, 1-x-y) (ref: sample/mod.rs:234-239)."""
    sqrtux = jnp.sqrt(u[..., 0])
    x = 1.0 - sqrtux
    y = sqrtux * u[..., 1]
    return vec3(x, y, 1.0 - x - y)


def power_heuristic(nf, pdff, ng, pdfg):
    """beta=2 power heuristic (ref: sample/mod.rs:243-247).  The
    denominator is clamped so 0/0 lanes stay finite (their
    contribution is masked, but a NaN primal would poison
    reverse-mode)."""
    f = nf * pdff
    g = ng * pdfg
    return (f * f) / jnp.maximum(f * f + g * g, 1e-30)


def balance_heuristic(nf, pdff, ng, pdfg):
    f = nf * pdff
    g = ng * pdfg
    return f / jnp.maximum(f + g, 1e-30)
