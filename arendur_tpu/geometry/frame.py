"""Shading-frame trigonometry and frame construction.

Local frame convention: the shading normal is +z (ref:
src/geometry/foundamental.rs mod normal, :205-309).  All functions are
batched over leading axes; `w` is a [..., 3] direction in the local
frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from arendur_tpu.geometry.vec import vec3, dot, cross, normalize


def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def sin2_theta(w):
    return jnp.abs(1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-30))


def _safe_div(a, b, eps=1e-20):
    safe = jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)
    return a / safe


def tan_theta(w):
    # safe at grazing angles: huge-but-finite instead of inf, keeping
    # reverse-mode NaN-free through masked lanes
    return _safe_div(sin_theta(w), cos_theta(w))


def tan2_theta(w):
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), 1e-30)


def cos_phi(w):
    st = sin_theta(w)
    return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 0] / st, -1.0, 1.0))


def sin_phi(w):
    st = sin_theta(w)
    return jnp.where(st == 0.0, 0.0, jnp.clip(w[..., 1] / st, -1.0, 1.0))


def cos2_phi(w):
    c = cos_phi(w)
    return c * c


def sin2_phi(w):
    s = sin_phi(w)
    return s * s


def acos_poly(x):
    """Polynomial acos over [-1,1] (A&S 4.4.45, max err ~7e-5 rad).
    Shared by the XLA and Pallas shade paths — Mosaic has no acos
    lowering, and sharing one approximation keeps them bit-identical.

    Accepted deviation: the ~7e-5 rad bound applies on EVERY backend,
    including CPU/XLA sites where the exact op would be free (sphere
    phi-clip, sphere uv, NEE cone sampling).  It introduces a
    systematic positional error of ~7e-5 x radius at partial-sphere
    clip boundaries — 3+ orders below render noise at any tested spp,
    and the golden/parity gates are calibrated with it in place."""
    xa = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = -0.0187293
    for c in (0.0742610, -0.2121144, 1.5707288):
        p = c + p * xa
    v = p * jnp.sqrt(1.0 - xa)
    return jnp.where(x >= 0.0, v, float(jnp.pi) - v)


def atan2_poly(y, x):
    """Polynomial atan2 (A&S 4.4.49 degree-9 odd minimax on [0,1];
    max err ~1e-5 rad).  Shared by the XLA and Pallas sphere paths —
    Mosaic has no atan2 lowering, and one shared approximation keeps
    the phi-clip/uv decisions bit-identical across paths."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.where(hi < 1e-30, 1e-30, hi)
    z2 = z * z
    p = 0.0208351
    for c in (-0.0851330, 0.1801410, -0.3302995, 0.9998660):
        p = c + p * z2
    a = p * z
    half_pi = 0.5 * float(jnp.pi)
    a = jnp.where(ay > ax, half_pi - a, a)
    a = jnp.where(x < 0.0, float(jnp.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def reflect(wo, n):
    """Mirror wo about n (ref: foundamental.rs:277)."""
    return -wo + 2.0 * dot(wo, n, keepdims=True) * n


def refract(wo, n, eta):
    """Refract wo about n with relative ior eta = etai/etat.

    Returns (wt, ok) where ok=False marks total internal reflection
    (the reference returns Option; ref: foundamental.rs:283-295).
    wt is zero-filled where ok is False.
    """
    ct = dot(wo, n)
    eta = jnp.broadcast_to(jnp.asarray(eta, wo.dtype), ct.shape)
    sin2 = jnp.maximum(1.0 - ct * ct, 0.0)
    sin2_t = eta * eta * sin2
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    wt = -eta[..., None] * wo + (eta * ct - cos_t)[..., None] * n
    return jnp.where(ok[..., None], wt, 0.0), ok


def get_basis_from(dir):
    """Return (u, v) completing `dir` to an orthonormal basis
    (ref: foundamental.rs:299-309: up=z unless dir≈z, then up=y).
    The up vector is built by stacking per-lane scalars instead of
    broadcasting a (3,) constant — Mosaic cannot capture 1-D array
    constants inside Pallas kernels."""
    near_z = jnp.abs(jnp.abs(dir[..., 2]) - 1.0) < 1e-5
    zero = jnp.zeros_like(dir[..., 0])
    up = jnp.stack([zero,
                    jnp.where(near_z, 1.0, 0.0),
                    jnp.where(near_z, 0.0, 1.0)], axis=-1)
    u = normalize(cross(up, dir))
    v = normalize(cross(dir, u))
    return u, v


def make_frame(ns, ts):
    """Build a (t, b, n) orthonormal frame from normal + tangent hint
    (ref: material/bsdf.rs:36-44: ts = normalize(dpdu), bs = n×ts)."""
    t = normalize(ts)
    b = normalize(cross(ns, t))
    return t, b, ns


def to_local(t, b, n, v):
    """World->local: (v·t, v·b, v·n)  (ref: bsdf.rs:67-69)."""
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(t, b, n, v):
    """Local->world (ref: bsdf.rs:73-79)."""
    return (v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n)


def spherical_to_vec(theta, phi):
    """(theta, phi) -> unit vector, z = cos(theta)."""
    st = jnp.sin(theta)
    return vec3(st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta))
