"""Screen-space footprint (du/dx etc.) from ray differentials.

Wavefront re-derivation of SurfaceInteraction::compute_dxy
(ref: src/geometry/interaction.rs:204-325): intersect the x/y
differential rays with the hit's tangent plane, then solve the
over-constrained 2x3 system [dpdu dpdv] * duv = dpdx for the uv
screen derivatives by picking the two coordinate axes where the
normal is largest (the same dimension-dropping trick as the
reference's solve).

Deeper bounces in the reference propagate differentials through
spawn_ray_differential (interaction.rs:236-252).  In the wavefront
design we instead carry a per-ray *cone* (footprint radius + spread
angle, Amanatides-style), which gives the same texture LOD growth
without storing six extra ray vectors per lane; the primary-hit
footprint is exact.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from arendur_tpu.geometry.vec import dot, cross, normalize


@struct.dataclass
class DxyInfo:
    """uv screen derivatives at a wave of hits (ref: DxyInfo,
    interaction.rs:267-305)."""
    dudx: jnp.ndarray  # [N]
    dvdx: jnp.ndarray
    dudy: jnp.ndarray
    dvdy: jnp.ndarray


def zero_dxy(n: int) -> DxyInfo:
    z = jnp.zeros((n,), jnp.float32)
    return DxyInfo(dudx=z, dvdx=z, dudy=z, dvdy=z)


def _plane_hit(p, nrm, ro, rd):
    """Intersect differential ray (ro, rd) with plane (p, nrm)
    (ref: interaction.rs:308-316)."""
    d = dot(nrm, p)
    denom = dot(nrm, rd)
    t = (d - dot(nrm, ro)) / jnp.where(jnp.abs(denom) < 1e-12,
                                       jnp.where(denom < 0, -1e-12, 1e-12),
                                       denom)
    return ro + t[..., None] * rd


def _solve_duv(nrm, dpdu, dpdv, dp):
    """Least-squares duv from dp = dpdu*du + dpdv*dv by dropping the
    dominant-normal axis (ref: interaction.rs:216-224,318-325)."""
    an = jnp.abs(nrm)
    # pick the two axes != argmax|n|
    amax = jnp.argmax(an, axis=-1)
    # (axis0, axis1) pairs for amax = 0,1,2 -> (1,2),(0,2),(0,1)
    a0 = jnp.where(amax == 0, 1, 0)
    a1 = jnp.where(amax == 2, 1, 2)
    idx = jnp.arange(dp.shape[0])
    A00 = dpdu[idx, a0]
    A01 = dpdv[idx, a0]
    A10 = dpdu[idx, a1]
    A11 = dpdv[idx, a1]
    b0 = dp[idx, a0]
    b1 = dp[idx, a1]
    det = A00 * A11 - A01 * A10
    ok = jnp.abs(det) > 1e-20
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    du = (A11 * b0 - A01 * b1) * inv
    dv = (A00 * b1 - A10 * b0) * inv
    return du, dv


def compute_dxy(pos, ng, dpdu, dpdv, rxo, rxd, ryo, ryd,
                valid=None) -> DxyInfo:
    """uv derivatives at hits [N] given x/y differential rays.

    valid: optional [N] bool; lanes without differentials get zeros
    (=> finest mip level, matching the reference's
    `DxyInfo::from_duv_info` fallback when diffs are None).
    """
    px = _plane_hit(pos, ng, rxo, rxd)
    py = _plane_hit(pos, ng, ryo, ryd)
    dudx, dvdx = _solve_duv(ng, dpdu, dpdv, px - pos)
    dudy, dvdy = _solve_duv(ng, dpdu, dpdv, py - pos)
    info = DxyInfo(dudx=dudx, dvdx=dvdx, dudy=dudy, dvdy=dvdy)
    if valid is not None:
        z = jnp.zeros_like(dudx)
        info = DxyInfo(
            dudx=jnp.where(valid, dudx, z),
            dvdx=jnp.where(valid, dvdx, z),
            dudy=jnp.where(valid, dudy, z),
            dvdy=jnp.where(valid, dvdy, z))
    return info


def cone_duv(r, d, ng, dpdu, dpdv):
    """Anisotropic uv footprint from a ray cone of radius `r` [N]
    hitting a surface with incident direction d [N,3].

    Reconstructs the two screen-axis uv gradients the reference gets
    from differential rays (interaction.rs:204-224): the footprint is
    an ellipse with major axis r/|cos(theta)| along the projected view
    direction and minor axis r across it (ray-cone texture LOD,
    Amanatides '84 / Akenine-Moller et al.).  Returns (duvdx [N,2],
    duvdy [N,2])."""
    cos_i = dot(d, ng)
    proj = d - cos_i[..., None] * ng
    p2 = jnp.sum(proj * proj, -1, keepdims=True)
    e1 = jnp.where(p2 > 1e-12, proj * jax_rsqrt(p2),
                   normalize(dpdu))
    e2 = cross(ng, e1)
    a1 = (r / jnp.maximum(jnp.abs(cos_i), 0.1))[..., None] * e1
    a2 = r[..., None] * e2
    dudx, dvdx = _solve_duv(ng, dpdu, dpdv, a1)
    dudy, dvdy = _solve_duv(ng, dpdu, dpdv, a2)
    return (jnp.stack([dudx, dvdx], -1), jnp.stack([dudy, dvdy], -1))


def jax_rsqrt(x):
    import jax
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


def scale_dxy(info: DxyInfo, s) -> DxyInfo:
    """RayDifferential::scale_differentials analogue applied post-solve
    (ref: ray.rs:287-300; pt.rs:142 scales by 1/sqrt(spp))."""
    return DxyInfo(dudx=info.dudx * s, dvdx=info.dvdx * s,
                   dudy=info.dudy * s, dvdy=info.dvdy * s)
