"""Fused Pallas closest-hit / any-hit kernels over the MXU
intersection formulation (see mxu_intersect.py for the math).

Why a kernel: the XLA path materializes the [N, 4*chunk] determinant
matrix in HBM every scan step (~2 GB per query at wave 64k x chunk
2048) and then reads it back for the accept/argmin pass — the render
is HBM-bound on an intermediate that never needs to exist.  Here the
matmul runs on the MXU with its output staying in VMEM; the accept
test, the per-chunk lane reduction and the running ray-wise best all
fuse into the same kernel, so HBM traffic per (ray-tile, tri-chunk)
grid step is just the W block (streamed once per ray tile) plus an
[RN, 8] accumulator that Pallas keeps resident in VMEM across the
chunk-sequential grid steps.

Layout: grid = (n_ray_tiles, n_tri_chunks); the triangle dimension is
innermost so the output block (indexed by ray tile only) is revisited
consecutively — the canonical Pallas reduction pattern.

Outputs are packed in one f32 [N, 8] array: col 0 = best t, col 1 =
best triangle id (exact in f32 up to 2^24 triangles), col 2 = b0,
col 3 = b1; cols 4-7 pad the store to a friendlier lane count.

Reference semantics mirrored: closest-hit with conservative epsilon
acceptance (triangle.rs:397-484's watertight test, epsilon form — see
DESIGN.md §2), any-hit for shadow rays (lighting/mod.rs:125-133).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from arendur_tpu.shapes.mxu_intersect import ray_features

_BIG = 3.0e38

# tuning knobs (see tools/tune_intersect.py): ray-tile override and
# matmul precision for the determinant matmul
_RAY_TILE_OVERRIDE = None


def _precision():
    name = os.environ.get("ARENDUR_MXU_PRECISION", "highest")
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[name]


def _quad_parts(feats, w_ref, chunk):
    """[RN,16] @ [16,4C] on the MXU; returns det/tdet/udet/vdet
    [RN, C] slices (blocked column layout, see pack_chunks)."""
    quad = jnp.dot(feats, w_ref[:], preferred_element_type=jnp.float32,
                   precision=_precision())
    det = quad[:, 0 * chunk:1 * chunk]
    tdet = quad[:, 1 * chunk:2 * chunk]
    udet = quad[:, 2 * chunk:3 * chunk]
    vdet = quad[:, 3 * chunk:4 * chunk]
    return det, tdet, udet, vdet


def _accept(det, tdet, udet, vdet, best_t):
    """Same acceptance rule as mxu_intersect._accept."""
    eps_d = 1e-12
    ok = jnp.abs(det) > eps_d
    inv = 1.0 / jnp.where(ok, det, 1.0)
    t = tdet * inv
    u = udet * inv
    v = vdet * inv
    tol = 1e-6
    hit = (ok & (u >= -tol) & (v >= -tol) & (u + v <= 1.0 + tol)
           & (t > 1e-5) & (t < best_t))
    return hit, t, u, v


def _closest_kernel(feats_ref, tmax_ref, w_ref, out_ref, *,
                    chunk: int, t_count: int):
    j = pl.program_id(1)
    is_first = j == 0
    cur = out_ref[:]                     # garbage at j==0, masked below
    best_t = jnp.where(is_first, tmax_ref[:, 0:1], cur[:, 0:1])
    best_id = jnp.where(is_first, -1.0, cur[:, 1:2])
    best_b0 = jnp.where(is_first, 0.0, cur[:, 2:3])
    best_b1 = jnp.where(is_first, 0.0, cur[:, 3:4])

    det, tdet, udet, vdet = _quad_parts(feats_ref[:], w_ref, chunk)
    hit, t, u, v = _accept(det, tdet, udet, vdet, best_t)

    rn = t.shape[0]
    ids = (j * chunk
           + jax.lax.broadcasted_iota(jnp.int32, (rn, chunk), 1))
    valid = hit & (ids < t_count)
    t_m = jnp.where(valid, t, _BIG)
    tmin = jnp.min(t_m, axis=-1, keepdims=True)          # [RN,1]
    # lowest-id winner among ties (deterministic closest-hit)
    id_best = jnp.min(jnp.where(t_m <= tmin, ids, jnp.int32(2 ** 30)),
                      axis=-1, keepdims=True)
    sel = (ids == id_best) & valid
    pick = lambda x: jnp.sum(jnp.where(sel, x, 0.0), axis=-1,
                             keepdims=True)

    # tmin == _BIG means "no valid hit this chunk" — must not beat an
    # infinite tmax carried in best_t
    better = (tmin < _BIG) & (tmin < best_t)
    u_b = pick(u)
    v_b = pick(v)
    out_ref[:] = jnp.concatenate([
        jnp.where(better, tmin, best_t),
        jnp.where(better, id_best.astype(jnp.float32), best_id),
        jnp.where(better, 1.0 - u_b - v_b, best_b0),
        jnp.where(better, u_b, best_b1),
        jnp.zeros((rn, 4), jnp.float32),
    ], axis=1)


def _anyhit_kernel(feats_ref, tmax_ref, w_ref, out_ref, *,
                   chunk: int, t_count: int):
    j = pl.program_id(1)
    cur = jnp.where(j == 0, 0.0, out_ref[:, 0:1])

    det, tdet, udet, vdet = _quad_parts(feats_ref[:], w_ref, chunk)
    hit, _, _, _ = _accept(det, tdet, udet, vdet, tmax_ref[:, 0:1])
    rn = det.shape[0]
    ids = (j * chunk
           + jax.lax.broadcasted_iota(jnp.int32, (rn, chunk), 1))
    any_block = jnp.max(
        jnp.where(hit & (ids < t_count), 1.0, 0.0), axis=-1,
        keepdims=True)
    out_ref[:] = jnp.broadcast_to(jnp.maximum(cur, any_block), (rn, 8))


def _ray_tile(chunk: int) -> int:
    if _RAY_TILE_OVERRIDE is not None:
        return _RAY_TILE_OVERRIDE
    # keep the [RN, 4*chunk] matmul output ~<= 5 MB of VMEM
    return 256 if chunk <= 1280 else 128


def _pad_rays(feats, tmax, rn):
    n = feats.shape[0]
    pad = (-n) % rn
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, feats.shape[1]), feats.dtype)], 0)
        tmax = jnp.concatenate(
            [tmax, jnp.zeros((pad,), tmax.dtype)], 0)
    return feats, tmax, n


@functools.partial(
    jax.jit,
    static_argnames=("t_count", "chunk", "anyhit", "interpret"))
def _run(w_chunks, feats, tmax, t_count: int, chunk: int,
         anyhit: bool, interpret: bool):
    n_chunks = w_chunks.shape[0]
    rn = _ray_tile(chunk)
    feats, tmax, n = _pad_rays(feats, tmax.astype(jnp.float32), rn)
    np_ = feats.shape[0]
    w_flat = w_chunks.reshape(n_chunks * 16, 4 * chunk)

    kern = _anyhit_kernel if anyhit else _closest_kernel
    out = pl.pallas_call(
        functools.partial(kern, chunk=chunk, t_count=t_count),
        grid=(np_ // rn, n_chunks),
        in_specs=[
            pl.BlockSpec((rn, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * chunk), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rn, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * 16 * 4 * chunk * n_chunks,
            bytes_accessed=(np_ // rn) * n_chunks * 16 * 4 * chunk * 4
            + np_ * (16 + 1 + 8) * 4,
            transcendentals=0),
        interpret=interpret,
    )(feats, tmax[:, None], w_flat)
    return out[:n]


def intersect_pallas(w_chunks, o, d, tmax, t_count: int,
                     chunk: int, interpret: bool = False):
    """Closest hit; same contract as mxu_intersect.intersect_mxu."""
    w_chunks = jnp.asarray(w_chunks)
    feats = ray_features(o, d)
    out = _run(w_chunks, feats, tmax, t_count, chunk, False, interpret)
    idx = out[:, 1].astype(jnp.int32)
    miss = idx < 0
    t = jnp.where(miss, tmax, out[:, 0])
    return t, idx, out[:, 2], out[:, 3]


def occluded_pallas(w_chunks, o, d, tmax, t_count: int,
                    chunk: int, interpret: bool = False):
    """Any-hit; same contract as mxu_intersect.occluded_mxu."""
    w_chunks = jnp.asarray(w_chunks)
    feats = ray_features(o, d)
    out = _run(w_chunks, feats, tmax, t_count, chunk, True, interpret)
    return out[:, 0] > 0.5
