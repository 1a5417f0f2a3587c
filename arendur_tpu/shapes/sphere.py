"""Analytic (possibly partial) spheres, wavefront-batched.

Mirrors the reference quadratic intersect + z/phi clipping + first/
second fundamental form duv computation (ref: src/shape/sphere.rs:
193-317).  Spheres live in their local frame with baked object<->world
matrices (the reference wraps ShapedPrimitive in
TransformedComposable; we fold that transform into the sphere record).

Note: the reference samples the sphere uniformly in (theta, phi) while
reporting pdf = 1/area (sphere.rs:304-317) — *not* area-uniform.  We
reproduce that behavior for output parity (``theta_uniform=True``) and
also provide a correct area-uniform mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from arendur_tpu.geometry.vec import vec3, dot, cross, normalize, length
from arendur_tpu.geometry import transform as tf
from arendur_tpu.geometry.frame import atan2_poly

PI = float(jnp.pi)

# The reference samples spheres uniformly in (theta, phi) while
# reporting pdf = 1/area (sphere.rs:304-317) — biased area sampling
# (e.g. a lambertian plane under a small emissive sphere receives 5/3
# the correct radiance).  True (the default) reproduces the reference
# exactly — this is the PARITY mode, since the golden image was
# rendered with the biased sampler; ARENDUR_SPHERE_THETA=area switches
# to correct area-uniform sampling (tools/measure_theta_bias.py
# quantifies the difference on the Cornell golden config; see
# tests/test_golden.py for the measured numbers).
import os as _os
THETA_UNIFORM_COMPAT = \
    _os.environ.get("ARENDUR_SPHERE_THETA", "compat") != "area"


@struct.dataclass
class SphereSoA:
    """S spheres with baked transforms."""
    o2w: jnp.ndarray       # [S, 4, 4]
    w2o: jnp.ndarray       # [S, 4, 4]
    radius: jnp.ndarray    # [S]
    zmin: jnp.ndarray      # [S]
    zmax: jnp.ndarray      # [S]
    thetamin: jnp.ndarray  # [S]
    thetamax: jnp.ndarray  # [S]
    phimax: jnp.ndarray    # [S]
    mat_id: jnp.ndarray    # [S] int32
    light_id: jnp.ndarray  # [S] int32, -1 if not emissive
    # host-static: every sphere is full-phi (set at build(); the
    # Pallas intersect kernel skips the phi clip statically)
    phi_full: bool = struct.field(pytree_node=False, default=False)

    @property
    def count(self):
        return self.radius.shape[0]


def shade_table(spheres: "SphereSoA"):
    """[S,24] packed rows for the bounce mega-kernel's sphere shading
    branch: o2w(16) radius thetamin thetamax phimax mat light pad(2)."""
    o2w = jnp.asarray(spheres.o2w).reshape(-1, 16)
    return jnp.concatenate([
        o2w,
        jnp.asarray(spheres.radius)[:, None],
        jnp.asarray(spheres.thetamin)[:, None],
        jnp.asarray(spheres.thetamax)[:, None],
        jnp.asarray(spheres.phimax)[:, None],
        jnp.asarray(spheres.mat_id).astype(jnp.float32)[:, None],
        jnp.asarray(spheres.light_id).astype(jnp.float32)[:, None],
        jnp.zeros((o2w.shape[0], 2), jnp.float32)], axis=1)


def sphere_shading_from_row(srow, p_local):
    """World shading info from packed shade_table rows [N,24] + the
    local hit point: (pos, ng, dpdu, dpdv, pos_err).  The Pallas
    bounce kernel's sphere branch — sphere_hit_info's math minus uv
    (the mega path is texture-free), with the shared polynomial acos
    (no Mosaic lowering; ~7e-5 rad, only scales the tangent frame)."""
    from arendur_tpu.geometry.frame import acos_poly
    o2w = srow[:, 0:16]
    radius = srow[:, 16]
    thetamin = srow[:, 17]
    thetamax = srow[:, 18]
    phimax = srow[:, 19]
    p = p_local
    thetadelta = thetamax - thetamin
    theta = acos_poly(jnp.clip(p[..., 2] / jnp.maximum(radius, 1e-20),
                               -1.0 + 1e-7, 1.0 - 1e-7))
    inv_zr = 1.0 / jnp.sqrt(
        jnp.maximum(p[..., 0] ** 2 + p[..., 1] ** 2, 1e-30))
    cphi = p[..., 0] * inv_zr
    sphi = p[..., 1] * inv_zr
    dpdu_l = vec3(-phimax * p[..., 1], phimax * p[..., 0],
                  jnp.zeros_like(phimax))
    dpdv_l = thetadelta[..., None] * vec3(
        p[..., 2] * cphi, p[..., 2] * sphi,
        -radius * jnp.sin(theta))
    pos = tf.transform_point_row16(o2w, p)
    dpdu = tf.transform_vector_row16(o2w, dpdu_l)
    dpdv = tf.transform_vector_row16(o2w, dpdv_l)
    ng = normalize(cross(dpdu, dpdv))
    pos_err = jnp.abs(pos) * (5.0 * 2.0 ** -24)
    return pos, ng, dpdu, dpdv, pos_err


def kernel_table(spheres: "SphereSoA"):
    """[S,24] packed rows for the Pallas intersect kernels:
    w2o(16) radius zmin zmax phimax pad(4)."""
    w2o = jnp.asarray(spheres.w2o).reshape(-1, 16)
    cols = [w2o,
            jnp.asarray(spheres.radius)[:, None],
            jnp.asarray(spheres.zmin)[:, None],
            jnp.asarray(spheres.zmax)[:, None],
            jnp.asarray(spheres.phimax)[:, None],
            jnp.zeros((w2o.shape[0], 4), jnp.float32)]
    return jnp.concatenate(cols, axis=1)


def make_sphere_params(radius, zmin, zmax, phimax):
    """Clamp + derived angles (ref: sphere.rs:133-156)."""
    import numpy as np
    radius = float(radius)
    zmin = max(float(zmin), -radius)
    zmax = min(float(zmax), radius)
    phimax = min(max(float(phimax), 0.0), 2.0 * np.pi)
    thetamin = float(np.arccos(np.clip(zmin / radius, -1, 1)))
    thetamax = float(np.arccos(np.clip(zmax / radius, -1, 1)))
    return radius, zmin, zmax, thetamin, thetamax, phimax


def refine_p_local(o, d, t, radius):
    """Local hit point refined to the surface (sphere.rs:233-238);
    shared by _intersect_local and the Pallas intersect kernel's
    sphere block (the outside p_local reconstruction must be
    bit-identical to the in-test clip decisions).  radius may be a
    scalar or per-lane [N]."""
    p = o + t[..., None] * d
    r_col = jnp.broadcast_to(jnp.asarray(radius), t.shape)[..., None]
    p = p * (r_col / jnp.maximum(length(p, keepdims=True), 1e-20))
    degenerate = (p[..., 0] == 0.0) & (p[..., 1] == 0.0)
    px = jnp.where(degenerate, 1e-5 * r_col[..., 0], p[..., 0])
    return jnp.stack([px, p[..., 1], p[..., 2]], axis=-1)


def _intersect_local(o, d, tmax, radius, zmin, zmax, phimax,
                     skip_phi_clip: bool = False):
    """Rays (local frame) vs one sphere. o,d: [N,3]; scalars per sphere.

    Returns (hit [N], t [N], p_local [N,3]).
    Reference quadratic (sphere.rs:193-221) then clip (sphere.rs:231-245,
    which rejects rather than retrying the far root — mirrored).
    skip_phi_clip statically removes the atan2-based phi test (valid
    for full-phi spheres; required inside Pallas kernels).
    """
    a = jnp.maximum(dot(d, d), 1e-20)
    b = 2.0 * dot(d, o)
    c = dot(o, o) - radius * radius
    delta = b * b - 4.0 * a * c
    has_root = delta >= 0.0
    sq = jnp.sqrt(jnp.maximum(delta, 1e-30))
    inv2a = 1.0 / (2.0 * a)
    d1 = sq * inv2a
    d0 = -b * inv2a
    t0 = d0 - d1
    t1 = d0 + d1
    t = jnp.where(t0 > 0.0, t0, t1)
    ok = has_root & ~((t0 > tmax) | (t1 < 0.0)) & ~((t0 <= 0.0) & (t1 > tmax))

    p = refine_p_local(o, d, t, radius)

    clipped = (p[..., 2] < zmin) | (p[..., 2] > zmax)
    if not skip_phi_clip:
        phi = atan2_poly(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
        clipped = clipped | (phi > phimax)
    return ok & ~clipped, t, p


def _local_duv(p, radius, thetamin, thetamax, phimax):
    """uv + dpdu/dpdv/dndu/dndv at local point p (sphere.rs:248-277)."""
    thetadelta = thetamax - thetamin
    phi = atan2_poly(p[..., 1], p[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
    u = phi / phimax
    theta = jnp.arccos(jnp.clip(p[..., 2] / radius, -1.0 + 1e-7,
                                1.0 - 1e-7))
    v = (theta - thetamin) / thetadelta
    inv_zr = 1.0 / jnp.sqrt(
        jnp.maximum(p[..., 0] ** 2 + p[..., 1] ** 2, 1e-30))
    cphi = p[..., 0] * inv_zr
    sphi = p[..., 1] * inv_zr
    dpdu = vec3(-phimax * p[..., 1], phimax * p[..., 0],
                jnp.zeros_like(phi))
    dpdv = jnp.asarray(thetadelta)[..., None] * vec3(
        p[..., 2] * cphi, p[..., 2] * sphi, -radius * jnp.sin(theta))
    uv = jnp.stack([u, v], axis=-1)
    return uv, dpdu, dpdv


def intersect_spheres(spheres: SphereSoA, o, d, tmax):
    import jax as _jax
    spheres = _jax.tree_util.tree_map(jnp.asarray, spheres)
    """N rays vs all S spheres -> closest hit.

    Returns dict with hit mask, t, sphere index, world position,
    geometric normal (= dpdu x dpdv direction), uv, dpdu (world).
    """
    def one(o2w, w2o, radius, zmin, zmax, thetamin, thetamax, phimax):
        ol = tf.transform_point(w2o, o)
        dl = tf.transform_vector(w2o, d)
        hit, t, pl = _intersect_local(ol, dl, tmax, radius, zmin, zmax,
                                      phimax)
        return hit, t, pl

    hits, ts, pls = jax.vmap(one, in_axes=(0,) * 8, out_axes=0)(
        spheres.o2w, spheres.w2o, spheres.radius, spheres.zmin,
        spheres.zmax, spheres.thetamin, spheres.thetamax, spheres.phimax)
    # hits: [S, N]
    t_masked = jnp.where(hits, ts, jnp.inf)
    s_idx = jnp.argmin(t_masked, axis=0)            # [N]
    n = o.shape[0]
    take = lambda arr: arr[s_idx, jnp.arange(n)]
    best_t = take(t_masked)
    hit_any = jnp.isfinite(best_t)
    p_local = pls[s_idx, jnp.arange(n)]
    return {
        "hit": hit_any,
        "t": jnp.where(hit_any, best_t, jnp.inf),
        "sphere_idx": jnp.where(hit_any, s_idx.astype(jnp.int32), -1),
        "p_local": p_local,
    }


def sphere_hit_info(spheres: SphereSoA, s_idx, p_local):
    import jax as _jax
    spheres = _jax.tree_util.tree_map(jnp.asarray, spheres)
    """Shading info for sphere hits: world pos, ng(=ns), uv, dpdu, pos_err."""
    # one packed row gather (o2w + angle params) instead of five: each
    # wavefront gather costs a full HBM round trip on TPU
    spack = jnp.concatenate([
        spheres.o2w.reshape(-1, 16),        # 0:16
        spheres.radius[:, None],            # 16
        spheres.thetamin[:, None],          # 17
        spheres.thetamax[:, None],          # 18
        spheres.phimax[:, None],            # 19
    ], axis=1)
    row = spack[s_idx]
    o2w = row[:, 0:16].reshape(-1, 4, 4)
    radius = row[:, 16]
    uv, dpdu_l, dpdv_l = _local_duv(
        p_local, radius, row[:, 17], row[:, 18], row[:, 19])
    pos = jax.vmap(tf.transform_point)(o2w, p_local)
    dpdu = jax.vmap(tf.transform_vector)(o2w, dpdu_l)
    dpdv = jax.vmap(tf.transform_vector)(o2w, dpdv_l)
    ng = normalize(cross(dpdu, dpdv))
    # the reference leaves pos_err = 0 for spheres ("FIXME: wrong",
    # sphere.rs:281-282); we use a conservative bound instead.
    pos_err = jnp.abs(pos) * (5.0 * 2.0 ** -24)
    return pos, ng, uv, dpdu, dpdv, pos_err


def sample_sphere_local(spheres: SphereSoA, s_idx, u2,
                        theta_uniform: bool = None):
    import jax as _jax
    spheres = _jax.tree_util.tree_map(jnp.asarray, spheres)
    """Area sampling in the sphere's local frame (ref: sphere.rs:304-317).

    Returns (p_local, n_local, pdf_area) with pdf = 1/surface_area
    (matching the reference even though theta-uniform sampling is not
    area-uniform).
    """
    if theta_uniform is None:
        theta_uniform = THETA_UNIFORM_COMPAT
    radius = spheres.radius[s_idx]
    phimax = spheres.phimax[s_idx]
    thetamin = spheres.thetamin[s_idx]
    thetamax = spheres.thetamax[s_idx]
    zmin = spheres.zmin[s_idx]
    zmax = spheres.zmax[s_idx]
    phi = u2[..., 0] * phimax
    if theta_uniform:
        theta = u2[..., 1] * (thetamax - thetamin) + thetamin
        z = jnp.cos(theta)
    else:
        z = zmin / radius + u2[..., 1] * (zmax - zmin) / radius
        theta = jnp.arccos(jnp.clip(z, -1.0 + 1e-7, 1.0 - 1e-7))
    st = jnp.sin(theta)
    n = vec3(st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta))
    p = n * radius[..., None]
    area = phimax * radius * (zmax - zmin)
    return p, n, 1.0 / area
