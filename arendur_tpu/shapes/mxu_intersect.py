"""MXU-native ray-triangle intersection.

The TPU's FLOPs live in the 128x128 systolic array, not the VPU — so
instead of evaluating Moller-Trumbore per (ray, triangle) pair
elementwise (as the shear-transform wavefront path does), we factor
the test into a single matmul:

For a triangle (v0, e1=v1-v0, e2=v2-v0) with normal n = e1 x e2 and a
ray (o, d):

    det    = e1 . (d x e2)        = -d . n                (linear in d)
    t*det  = e2 . ((o-v0) x e1)   = o . n - v0 . n        (affine in o)
    u*det  = (o-v0) . (d x e2)    = sum_ij o_i d_j E2_ij - d . (e2 x v0)
    v*det  = d . ((o-v0) x e1)    = sum_ij d_i o_j E1_ij - d . (e1 x -v0)...

i.e. every quantity is linear in the 16-feature ray vector

    F = [o(3), d(3), vec(o (x) d)(9), 1]

so N rays vs T triangles is one [N,16] @ [16, 4T] f32 matmul
(precision=HIGHEST) followed by a cheap masked min-reduction.  Per
pair this costs ~128 MXU flops vs ~40 VPU flops — but the MXU is an
order of magnitude faster, and XLA tiles it natively.

The triangle weight matrix is precomputed once at scene build.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# default triangle-chunk size: keeps the [N, CHUNK] intermediates in
# reasonable HBM footprint while saturating the MXU's 128-lane tiling
DEFAULT_CHUNK = 2048


def build_tri_matrix(v0, v1, v2) -> np.ndarray:
    """Precompute W [16, 4T], interleaved (det, tdet, udet, vdet) per
    tri (pack_chunks converts to the blocked per-chunk layout).

    Feature layout: F = [o0,o1,o2, d0,d1,d2, o0d0,o0d1,o0d2, o1d0,...,
    o2d2, 1].
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = len(v0)
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)

    w = np.zeros((16, 4 * t), np.float32)

    def eps_mat(e):
        """M_ij = (x (x) y -> x . (y x e)) coefficient: x_i y_j term of
        x . (y x e) = sum_ij x_i y_j (e_x ... ) via levi-civita."""
        # x . (y x e): component = eps_{ijk} x_i y_j e_k
        m = np.zeros((t, 3, 3), np.float32)
        # eps terms: (i,j,k) cyclic +, anticyclic -
        for (i, j, k, s) in ((0, 1, 2, 1), (1, 2, 0, 1), (2, 0, 1, 1),
                             (0, 2, 1, -1), (2, 1, 0, -1), (1, 0, 2, -1)):
            m[:, i, j] += s * e[:, k]
        return m

    # det = -d . n
    w[3:6, 0::4] = -n.T
    # tdet = o . n - v0 . n
    w[0:3, 1::4] = n.T
    w[15, 1::4] = -np.sum(v0 * n, -1)
    # udet = o . (d x e2) - v0 . (d x e2)
    #      = eps(o, d; e2) - d . (e2 x v0)
    m_u = eps_mat(e2)                      # o_i d_j coefficients
    w[6:15, 2::4] = m_u.reshape(t, 9).T
    w[3:6, 2::4] = -np.cross(e2, v0).T
    # vdet = d . ((o - v0) x e1) = eps(d, o; e1) - d . (v0 x e1)
    #      -> o_i d_j coefficient = m[j, i] of eps_mat(e1);
    #         d-linear coefficient = -(v0 x e1) = e1 x v0
    m_v = np.transpose(eps_mat(e1), (0, 2, 1))
    w[6:15, 3::4] = m_v.reshape(t, 9).T
    w[3:6, 3::4] = np.cross(e1, v0).T
    return w


def ray_features(o, d):
    """[N,16] feature vector per ray."""
    outer = (o[:, :, None] * d[:, None, :]).reshape(-1, 9)
    ones = jnp.ones((o.shape[0], 1), o.dtype)
    return jnp.concatenate([o, d, outer, ones], axis=-1)


def ray_teps(o):
    """Per-ray self-hit guard epsilon, scaled with the ray origin's
    magnitude so off-origin scenes keep working (scale-robust form of
    the reference's conservative bound, triangle.rs:431-451)."""
    return 1e-5 * (1.0 + jnp.max(jnp.abs(o), axis=-1))


def _accept(det, tdet, udet, vdet, tmax, teps):
    """Masked accept + t from the four determinants.  teps [N]: per-ray
    relative t epsilon (ray_teps).

    The barycentric bounds are tested in determinant space (u >= -tol
    becomes u*det >= -tol*|det|) with the exact op sequence of the
    Pallas kernel's accept — the cluster parity tests require the two
    paths to agree bit-for-bit on the same backend."""
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    a = det * s
    ok = a > 1e-12
    us = udet * s
    vs = vdet * s
    ta = a * 1e-6
    okb = (us >= -ta) & (vs >= -ta) & (us + vs <= a + ta)
    inv = 1.0 / jnp.where(ok, a, 1.0)
    t = (tdet * s) * inv
    hit = (ok & okb & (t > teps[:, None]) & (t < tmax[:, None]))
    return hit, t, us * inv, vs * inv


def intersect_mxu(w_chunks, o, d, tmax, t_count: int,
                  chunk: int = DEFAULT_CHUNK):
    """Closest hit of N rays vs T triangles via chunked MXU matmuls.

    w_chunks: [n_chunks, 16, 4*chunk] precomputed, blocked per chunk:
    cols [0:C]=det, [C:2C]=tdet, [2C:3C]=udet, [3C:4C]=vdet (pad with
    zero columns -> det==0 -> rejected).  Returns (t, idx, b0, b1) with
    b0 = 1-u-v, b1 = u (matching the watertight path's barycentric
    convention b0*v0 + b1*v1 + b2*v2 where u maps v1, v maps v2).
    """
    w_chunks = jnp.asarray(w_chunks)
    n = o.shape[0]
    feats = ray_features(o, d)
    teps = ray_teps(o)
    tie = o[:, 0] * 0.0
    init = (
        tmax.astype(jnp.float32) + tie,
        jnp.full((n,), -1, jnp.int32) + tie.astype(jnp.int32),
        tie,
        tie,
    )
    base_ids = (jnp.arange(w_chunks.shape[0]) * chunk).astype(jnp.int32)

    def body(carry, inp):
        best_t, best_i, best_b0, best_b1 = carry
        w, base = inp
        quad = jnp.matmul(feats, w, precision=_HI)  # [N, 4*chunk]
        det = quad[:, 0 * chunk:1 * chunk]
        tdet = quad[:, 1 * chunk:2 * chunk]
        udet = quad[:, 2 * chunk:3 * chunk]
        vdet = quad[:, 3 * chunk:4 * chunk]
        hit, t, u, v = _accept(det, tdet, udet, vdet, best_t, teps)
        ids = base + jnp.arange(chunk, dtype=jnp.int32)
        valid = hit & (ids[None, :] < t_count)
        t_masked = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t_masked, axis=-1)
        tj = jnp.take_along_axis(t_masked, j[:, None], 1)[:, 0]
        uj = jnp.take_along_axis(u, j[:, None], 1)[:, 0]
        vj = jnp.take_along_axis(v, j[:, None], 1)[:, 0]
        better = tj < best_t
        sel = lambda a, b: jnp.where(better, a, b)
        return (sel(tj, best_t), sel(ids[j], best_i),
                sel(1.0 - uj - vj, best_b0), sel(uj, best_b1)), None

    (best_t, best_i, best_b0, best_b1), _ = jax.lax.scan(
        body, init, (w_chunks, base_ids))
    return best_t, best_i, best_b0, best_b1


def occluded_mxu(w_chunks, o, d, tmax, t_count: int,
                 chunk: int = DEFAULT_CHUNK):
    """Any-hit via the same matmul formulation."""
    w_chunks = jnp.asarray(w_chunks)
    n = o.shape[0]
    feats = ray_features(o, d)
    teps = ray_teps(o)
    base_ids = (jnp.arange(w_chunks.shape[0]) * chunk).astype(jnp.int32)

    def body(blocked, inp):
        w, base = inp
        quad = jnp.matmul(feats, w, precision=_HI)
        hit, t, u, v = _accept(
            quad[:, 0 * chunk:1 * chunk], quad[:, 1 * chunk:2 * chunk],
            quad[:, 2 * chunk:3 * chunk], quad[:, 3 * chunk:4 * chunk],
            tmax, teps)
        ids = base + jnp.arange(chunk, dtype=jnp.int32)
        return blocked | jnp.any(hit & (ids[None, :] < t_count), -1), None

    blocked, _ = jax.lax.scan(
        body, o[:, 0] != o[:, 0], (w_chunks, base_ids))
    return blocked


def pack_chunks(v0, v1, v2, chunk: int = DEFAULT_CHUNK):
    """Precompute + chunk the weight matrix: [n_chunks, 16, 4*chunk],
    blocked per chunk (cols [0:C]=det, [C:2C]=tdet, [2C:3C]=udet,
    [3C:4C]=vdet) so kernels slice quantities with static column
    ranges instead of a lane-dim reshape."""
    t = len(v0)
    w = build_tri_matrix(v0, v1, v2)
    pad_t = (-t) % chunk
    if pad_t:
        w = np.concatenate(
            [w, np.zeros((16, 4 * pad_t), np.float32)], axis=1)
    n_chunks = (t + pad_t) // chunk
    # [16, n_chunks, chunk, 4] -> [n_chunks, 16, 4(quantity), chunk]
    w = w.reshape(16, n_chunks, chunk, 4).transpose(1, 0, 3, 2)
    return np.ascontiguousarray(w.reshape(n_chunks, 16, 4 * chunk))
