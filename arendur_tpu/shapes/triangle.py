"""Watertight ray-triangle intersection, wavefront-batched.

Re-derives the reference's shearing-transform Möller test
(ref: src/shape/triangle.rs:397-484, src/geometry/ray.rs:171-236) as a
broadcasted [N rays, C tris] computation: permute the dominant ray axis
to z (cyclic, matching ray.rs Permulation XZ/YZ/ZZ), shear so the ray
is +z, then 2D edge functions with conservative error bounds
(eb_term, ref: src/geometry/float.rs:33).

The full-scene intersector streams triangle chunks through a
`lax.scan`, keeping a running closest hit per ray — the SoA wavefront
replacement for the reference's recursive closest-hit protocol
(Composable::intersect_ray mutating ray.tmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arendur_tpu.geometry.vec import cross, dot, normalize

# Higham's u for f32 (ref: float.rs machine_epsilon)
_MACHINE_EPS = 2.0 ** -24


def eb_term(n: float) -> float:
    """gamma_n = n*u / (1 - n*u)  (ref: float.rs:33)."""
    nu = n * _MACHINE_EPS
    return nu / (1.0 - nu)


def ray_shear(d):
    """Per-ray shear cache: permutation indices + shear coefficients.

    Returns (perm [N, 3] int32 gather indices, shear [N, 3]).
    perm maps world components into the sheared frame (dominant axis
    -> z) by cyclic rotation, as the reference's Permulation does.
    """
    ax = jnp.abs(d)
    # kz = dominant axis; cyclic perm puts components (kz+1, kz+2, kz)
    kz = jnp.where(
        (ax[..., 0] > ax[..., 1]) & (ax[..., 0] > ax[..., 2]), 0,
        jnp.where(ax[..., 1] > ax[..., 2], 1, 2))
    kx = (kz + 1) % 3
    ky = (kz + 2) % 3
    perm = jnp.stack([kx, ky, kz], axis=-1)
    dz = jnp.take_along_axis(d, perm, axis=-1)
    shear = jnp.stack([
        -dz[..., 0] / dz[..., 2],
        -dz[..., 1] / dz[..., 2],
        1.0 / dz[..., 2]], axis=-1)
    return perm, shear


def _watertight_core(p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, tmax):
    """Edge-function accept test on sheared points (shape-generic: the
    [N,C] batch sweep and the BVH's [N] lane-wise leaf test share this
    exact expression tree so their accept decisions are identical —
    the SURVEY M2 'identical hits' requirement)."""
    e0 = p1x * p2y - p1y * p2x
    e1 = p2x * p0y - p2y * p0x
    e2 = p0x * p1y - p0y * p1x

    # XLA contracts a*b - c*d into fma, so an edge function that is
    # exactly 0 in IEEE f32 (ray through a shared edge) can come out as
    # +/- 1ulp under jit.  The Rust reference relies on strict IEEE
    # cancellation for watertightness; here we instead accept edge
    # values within a relative epsilon — on-edge rays then hit *both*
    # adjacent triangles (the closest-hit reduction keeps one) rather
    # than falling through a crack.
    maxab = jnp.maximum(
        jnp.maximum(jnp.abs(p1x * p2y) + jnp.abs(p1y * p2x),
                    jnp.abs(p2x * p0y) + jnp.abs(p2y * p0x)),
        jnp.abs(p0x * p1y) + jnp.abs(p0y * p1x))
    eps_e = maxab * 2.0 ** -22
    same_sign = ((e0 >= -eps_e) & (e1 >= -eps_e) & (e2 >= -eps_e)) | \
                ((e0 <= eps_e) & (e1 <= eps_e) & (e2 <= eps_e))
    det = e0 + e1 + e2
    nonzero = det != 0.0

    tscaled = e0 * p0z + e1 * p1z + e2 * p2z
    in_range = jnp.where(
        det < 0.0,
        (tscaled < 0.0) & (tscaled >= tmax * det),
        (tscaled > 0.0) & (tscaled <= tmax * det))

    safe_det = jnp.where(nonzero, det, 1.0)
    inv_det = 1.0 / safe_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    t = tscaled * inv_det

    # conservative epsilon rejection (ref: triangle.rs:431-451)
    maxxt = jnp.maximum(jnp.maximum(jnp.abs(p0x), jnp.abs(p1x)), jnp.abs(p2x))
    maxyt = jnp.maximum(jnp.maximum(jnp.abs(p0y), jnp.abs(p1y)), jnp.abs(p2y))
    maxzt = jnp.maximum(jnp.maximum(jnp.abs(p0z), jnp.abs(p1z)), jnp.abs(p2z))
    maxe = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    deltax = maxxt * eb_term(5.0)
    deltay = maxyt * eb_term(5.0)
    deltaz = maxzt * eb_term(3.0)
    delta_err = 2.0 * (eb_term(2.0) * maxxt * maxyt
                       + deltay * maxxt + deltax * maxyt)
    delta_t = 3.0 * (eb_term(3.0) * maxe * maxzt
                     + delta_err * maxzt + deltaz * maxe) * jnp.abs(inv_det)

    hit = same_sign & nonzero & in_range & (t > delta_t)
    return hit, t, b0, b1


def intersect_batch(o, d, tmax, perm, shear, v0, v1, v2):
    """Test N rays against C triangles -> (hit [N,C], t, b0, b1).

    o, d: [N, 3]; tmax: [N]; perm/shear: from ray_shear;
    v0, v1, v2: [C, 3].  All outputs [N, C].
    """
    # translate + permute: [N, C, 3]
    def shear_pts(v):
        p = v[None, :, :] - o[:, None, :]
        p = jnp.take_along_axis(p, jnp.broadcast_to(
            perm[:, None, :], p.shape), axis=-1)
        px = p[..., 0] + shear[:, None, 0] * p[..., 2]
        py = p[..., 1] + shear[:, None, 1] * p[..., 2]
        pz = p[..., 2] * shear[:, None, 2]
        return px, py, pz

    p0 = shear_pts(v0)
    p1 = shear_pts(v1)
    p2 = shear_pts(v2)
    return _watertight_core(*p0, *p1, *p2, tmax[:, None])


def intersect_watertight_lanewise(o, d, tmax, perm, shear, v0, v1, v2):
    """Ray i vs triangle i with the SAME watertight test as
    intersect_batch (shared _watertight_core) — the BVH leaf test,
    guaranteeing identical accepts vs the naive oracle (SURVEY M2).
    o, d, v*: [N,3]; tmax: [N]."""
    def shear_pts(v):
        p = v - o
        p = jnp.take_along_axis(p, perm, axis=-1)
        px = p[..., 0] + shear[..., 0] * p[..., 2]
        py = p[..., 1] + shear[..., 1] * p[..., 2]
        pz = p[..., 2] * shear[..., 2]
        return px, py, pz

    p0 = shear_pts(v0)
    p1 = shear_pts(v1)
    p2 = shear_pts(v2)
    return _watertight_core(*p0, *p1, *p2, tmax)


def intersect_scene_tris(o, d, tmax, v0, v1, v2, chunk: int = 512):
    """Closest hit of N rays against all T triangles.

    Returns (t [N], tri_idx [N] (-1 if miss), b0, b1).  Scans over
    padded triangle chunks keeping a running minimum — the wavefront
    equivalent of BVH-free `Naive` traversal (ref: component/naive.rs),
    and the correctness oracle for the BVH.
    """
    n = o.shape[0]
    t_count = v0.shape[0]
    perm, shear = ray_shear(d)

    pad = (-t_count) % chunk
    def pad_tri(v):
        return jnp.pad(v, ((0, pad), (0, 0)), constant_values=0.0)
    v0p, v1p, v2p = pad_tri(v0), pad_tri(v1), pad_tri(v2)
    nchunks = (t_count + pad) // chunk
    v0c = v0p.reshape(nchunks, chunk, 3)
    v1c = v1p.reshape(nchunks, chunk, 3)
    v2c = v2p.reshape(nchunks, chunk, 3)
    base_ids = jnp.arange(nchunks) * chunk

    # derive the init carry from the (possibly mesh-varying) ray
    # arrays so shard_map's varying-axes check accepts the scan
    tie = o[:, 0] * 0.0
    init = (
        tmax.astype(jnp.float32) + tie,
        jnp.full((n,), -1, jnp.int32) + tie.astype(jnp.int32),
        tie,
        tie,
    )

    def body(carry, inp):
        best_t, best_i, best_b0, best_b1 = carry
        cv0, cv1, cv2, base = inp
        hit, t, b0, b1 = intersect_batch(o, d, best_t, perm, shear,
                                         cv0, cv1, cv2)
        ids = base + jnp.arange(chunk, dtype=jnp.int32)
        valid = hit & (ids[None, :] < t_count)
        t_masked = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t_masked, axis=-1)
        tj = jnp.take_along_axis(t_masked, j[:, None], 1)[:, 0]
        better = tj < best_t
        sel = lambda new, old: jnp.where(better, new, old)
        best_t = sel(tj, best_t)
        best_i = sel(ids[j], best_i)
        best_b0 = sel(jnp.take_along_axis(b0, j[:, None], 1)[:, 0], best_b0)
        best_b1 = sel(jnp.take_along_axis(b1, j[:, None], 1)[:, 0], best_b1)
        return (best_t, best_i, best_b0, best_b1), None

    (best_t, best_i, best_b0, best_b1), _ = jax.lax.scan(
        body, init, (v0c, v1c, v2c, base_ids.astype(jnp.int32)))
    return best_t, best_i, best_b0, best_b1


def occluded_tris(o, d, tmax, v0, v1, v2, chunk: int = 512):
    """Any-hit query for shadow rays: True where some triangle blocks
    the segment [0, tmax] (ref: LightSample::occluded, lighting/mod.rs:125)."""
    t_count = v0.shape[0]
    perm, shear = ray_shear(d)
    pad = (-t_count) % chunk
    def pad_tri(v):
        return jnp.pad(v, ((0, pad), (0, 0)), constant_values=0.0)
    nchunks = (t_count + pad) // chunk
    v0c = pad_tri(v0).reshape(nchunks, chunk, 3)
    v1c = pad_tri(v1).reshape(nchunks, chunk, 3)
    v2c = pad_tri(v2).reshape(nchunks, chunk, 3)
    base_ids = (jnp.arange(nchunks) * chunk).astype(jnp.int32)

    def body(blocked, inp):
        cv0, cv1, cv2, base = inp
        hit, _, _, _ = intersect_batch(o, d, tmax, perm, shear, cv0, cv1, cv2)
        ids = base + jnp.arange(chunk, dtype=jnp.int32)
        valid = hit & (ids[None, :] < t_count)
        return blocked | jnp.any(valid, axis=-1), None

    blocked, _ = jax.lax.scan(
        body, o[:, 0] != o[:, 0], (v0c, v1c, v2c, base_ids))
    return blocked


def intersect_one(o, d, tmax, v0, v1, v2):
    """Per-lane single-triangle test (ray i vs triangle i), used for
    area-light pdf queries (ref: shape/mod.rs:67-75 pdf_wrt).
    o,d,v*: [N,3].  Returns (hit [N], t [N])."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvec = o - v0
    u = dot(tvec, pvec) * inv
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv
    t = dot(e2, qvec) * inv
    hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t > 1e-6) & (t <= tmax)
    return hit, jnp.where(hit, t, jnp.inf)


def tri_dpduv(v0, v1, v2, uv0, uv1, uv2):
    """dpdu/dpdv from uv deltas (ref: triangle.rs:309-331).

    Degenerate uv determinant falls back to an arbitrary frame spanning
    the triangle plane.
    """
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = v0 - v2
    dp12 = v1 - v2
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    ok = det != 0.0
    inv = 1.0 / jnp.where(ok, det, 1.0)
    dpdu = (duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12) * inv[..., None]
    dpdv = (-duv12[..., 0:1] * dp02 + duv02[..., 0:1] * dp12) * inv[..., None]
    # fallback: build a basis in the plane
    ng = cross(dp02, v0 - v1)
    fb_u = normalize(dp02)
    fb_v = normalize(cross(ng, dp02))
    dpdu = jnp.where(ok[..., None], dpdu, fb_u)
    dpdv = jnp.where(ok[..., None], dpdv, fb_v)
    return dpdu, dpdv


def sample_tri(v0, v1, v2, n0, n1, n2, bary):
    """Area-sample a triangle at barycentric [..., 3]
    (ref: triangle.rs:494-504): returns (p, interpolated normal, pdf=1/area)."""
    p = (bary[..., 0:1] * v0 + bary[..., 1:2] * v1 + bary[..., 2:3] * v2)
    n = (bary[..., 0:1] * n0 + bary[..., 1:2] * n1 + bary[..., 2:3] * n2)
    area = 0.5 * jnp.linalg.norm(cross(v1 - v0, v2 - v0), axis=-1)
    return p, normalize(n), 1.0 / area


def tri_area(v0, v1, v2):
    return 0.5 * jnp.linalg.norm(cross(v1 - v0, v2 - v0), axis=-1)
