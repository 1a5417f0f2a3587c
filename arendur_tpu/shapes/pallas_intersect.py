"""Fused Pallas closest-hit / any-hit kernels over the cluster-packed
MXU intersection formulation (see mxu_intersect.py for the math and
accel/clusters.py for the SAH cluster cut).

Why a kernel: the XLA path materializes the [N, 4K] determinant
matrix in HBM every scan step and reads it back for the accept/argmin
pass — the render is HBM-bound on an intermediate that never needs to
exist.  Here the matmul runs on the MXU with its output staying in
VMEM; the accept test, the per-cluster lane reduction and the running
ray-wise best all fuse into the same kernel.

Two-level culling (the TPU re-shaping of the reference's BVH walk,
ref: src/component/bvh.rs:97-146):

* grid = (ray_tiles, clusters), cluster innermost so the per-tile
  output block stays resident in VMEM across clusters;
* every (tile, cluster) step slab-tests the tile's rays against the
  cluster AABB (ref: bbox.rs:549-592's cached test, vectorized) using
  each ray's *current best t* as the far bound — clusters behind an
  already-found hit are skipped (dynamic occlusion culling, the
  analogue of the reference's ``tn < ray.tmax`` stack prune);
* the [RN,16] @ [16,4K] determinant matmul and the accept/min
  reduction only run under ``@pl.when`` for surviving clusters;
* ray tiles entirely past ``n_alive`` (the integrator compacts dead
  lanes to the back of the wave) skip everything.

Outputs are packed in one f32 [N, 8] array: col 0 = best t, col 1 =
best *slot* id (cluster*K + lane; the caller maps slots to original
triangle ids via the cluster remap table), cols 2-7 pad the store to
a friendly lane count.  Barycentrics of the winning triangle are
recomputed outside the kernel from its vertices (O(N) instead of
O(N*T) extraction passes).

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

from arendur_tpu.shapes.mxu_intersect import ray_features
from arendur_tpu.shapes import sphere as sph

_BIG = 3.0e38
_G3 = 3.0 * 2.0 ** -24 / (1.0 - 3.0 * 2.0 ** -24)
_RAY_TILE = 256


def _slab_hit(feats, cbox_ref, j, tfar_bound):
    """[RN,1] mask: ray segment may intersect cluster j's AABB within
    (0, tfar_bound) (tfar_bound [RN,1] = per-ray current best t).
    Per-axis scalar reads of the cluster box keep every intermediate
    2D (Mosaic-friendly)."""
    tn = None
    tf = None
    for ax in range(3):
        oa = feats[:, ax:ax + 1]
        da = feats[:, 3 + ax:4 + ax]
        # guarded inverse: huge-but-finite so 0*inv stays finite
        inv = jnp.where(jnp.abs(da) < 1e-30,
                        jnp.where(da < 0.0, -1e30, 1e30), 1.0 / da)
        t0 = (cbox_ref[j, ax] - oa) * inv
        t1 = (cbox_ref[j, 3 + ax] - oa) * inv
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        tn = lo if tn is None else jnp.maximum(tn, lo)
        tf = hi if tf is None else jnp.minimum(tf, hi)
    tf = tf * (1.0 + 2.0 * _G3)
    return (tn <= tf) & (tf > 0.0) & (tn < tfar_bound)


def _accept(quad, aux, best_t, k: int):
    """Lean accept: (valid [RN,K], t [RN,K]).  aux col 1 = per-ray
    relative t epsilon (scale-robust self-hit guard, ref:
    triangle.rs:431-451's conservative bound)."""
    det = quad[:, 0 * k:1 * k]
    tdet = quad[:, 1 * k:2 * k]
    udet = quad[:, 2 * k:3 * k]
    vdet = quad[:, 3 * k:4 * k]
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    a = det * s
    ok = a > 1e-12            # degenerate/padded columns (det==0)
    us = udet * s
    vs = vdet * s
    ta = a * 1e-6
    okb = (us >= -ta) & (vs >= -ta) & (us + vs <= a + ta)
    inv = 1.0 / jnp.where(ok, a, 1.0)
    t = (tdet * s) * inv
    teps = aux[:, 1:2]
    okt = (t > teps) & (t < best_t)
    return ok & okb & okt, t


def _sphere_best(feats, aux, sph_ref, n_sph: int, full_phi: bool,
                 rn: int):
    """Closest sphere hit per ray tile: (best_t [RN,1], code [RN,1]).

    code = -(2+s) for a hit on sphere s, -1 for miss.  Reuses
    sphere._intersect_local verbatim so accepts match the XLA sphere
    path bit-for-bit.  sph row layout: w2o(16) radius zmin zmax phimax
    (+4 pad); unrolled over the (small, static) sphere count."""
    o = feats[:, 0:3]
    d = feats[:, 3:6]
    tmax = aux[:, 0]
    best = tmax
    code = jnp.full((rn,), -1.0, jnp.float32)
    for si in range(n_sph):
        m = lambda c: sph_ref[si, c]
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        olx = ox * m(0) + oy * m(4) + oz * m(8) + m(12)
        oly = ox * m(1) + oy * m(5) + oz * m(9) + m(13)
        olz = ox * m(2) + oy * m(6) + oz * m(10) + m(14)
        ow = ox * m(3) + oy * m(7) + oz * m(11) + m(15)
        inv_w = 1.0 / jnp.where(jnp.abs(ow) < 1e-20, 1.0, ow)
        ol = jnp.stack([olx * inv_w, oly * inv_w, olz * inv_w], -1)
        dl = jnp.stack([
            dx * m(0) + dy * m(4) + dz * m(8),
            dx * m(1) + dy * m(5) + dz * m(9),
            dx * m(2) + dy * m(6) + dz * m(10)], -1)
        hit, t, _ = sph._intersect_local(
            ol, dl, tmax, m(16), m(17), m(18), m(19),
            skip_phi_clip=full_phi)
        better = hit & (t < best)
        best = jnp.where(better, t, best)
        code = jnp.where(better, jnp.float32(-(2 + si)), code)
    return best[:, None], code[:, None]


def _closest_kernel(feats_ref, aux_ref, cbox_ref, w_ref, sph_ref,
                    out_ref, *, k: int, rn: int, n_sph: int,
                    full_phi: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if n_sph:
            # analytic spheres tested once per tile; clusters then
            # prune against the sphere-bounded best t (the XLA sphere
            # intersector used to run as ~40 separate fixed-cost ops)
            sb, scode = _sphere_best(feats_ref[:], aux_ref[:], sph_ref,
                                     n_sph, full_phi, rn)
            out_ref[:] = jnp.concatenate(
                [sb, scode, jnp.zeros((rn, 6), jnp.float32)], axis=1)
        else:
            out_ref[:] = jnp.concatenate(
                [aux_ref[:, 0:1], jnp.full((rn, 1), -1.0, jnp.float32),
                 jnp.zeros((rn, 6), jnp.float32)], axis=1)

    best_t = out_ref[:, 0:1]
    n_alive = aux_ref[0, 2].astype(jnp.int32)
    period = aux_ref[0, 3].astype(jnp.int32)
    # period > 0: the wave is I stacked instance blocks of `period`
    # rays each (batched instancing); the compaction bound applies
    # within every block, not to the flat index
    base = i * rn
    base = jnp.where(period > 0, base % jnp.maximum(period, 1), base)
    tile_live = base < n_alive
    lane_ok = (base + jax.lax.broadcasted_iota(
        jnp.int32, (rn, 1), 0)) < n_alive
    box = _slab_hit(feats_ref[:], cbox_ref, j, best_t) & lane_ok

    @pl.when(jnp.any(box) & tile_live)
    def _test():
        quad = jnp.dot(feats_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        valid, t = _accept(quad, aux_ref[:], best_t, k)
        t_m = jnp.where(valid & box, t, _BIG)
        tmin = jnp.min(t_m, axis=-1, keepdims=True)
        ids = (j * k
               + jax.lax.broadcasted_iota(jnp.int32, (rn, k), 1))
        # lowest-slot winner among ties (deterministic closest-hit)
        id_best = jnp.min(
            jnp.where(t_m <= tmin, ids, jnp.int32(2 ** 30)),
            axis=-1, keepdims=True)
        cur = out_ref[:]
        better = (tmin < _BIG) & (tmin < cur[:, 0:1])
        out_ref[:] = jnp.concatenate(
            [jnp.where(better, tmin, cur[:, 0:1]),
             jnp.where(better, id_best.astype(jnp.float32),
                       cur[:, 1:2]),
             jnp.zeros((rn, 6), jnp.float32)], axis=1)


def _anyhit_kernel(feats_ref, aux_ref, cbox_ref, w_ref, sph_ref,
                   out_ref, *, k: int, rn: int, n_sph: int,
                   full_phi: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if n_sph:
            _, scode = _sphere_best(feats_ref[:], aux_ref[:], sph_ref,
                                    n_sph, full_phi, rn)
            out_ref[:] = jnp.broadcast_to(
                jnp.where(scode != -1.0, 1.0, 0.0), (rn, 8))
        else:
            out_ref[:] = jnp.zeros((rn, 8), jnp.float32)

    blocked = out_ref[:, 0:1] > 0.5
    n_alive = aux_ref[0, 2].astype(jnp.int32)
    period = aux_ref[0, 3].astype(jnp.int32)
    base = i * rn
    base = jnp.where(period > 0, base % jnp.maximum(period, 1), base)
    tile_live = base < n_alive
    lane_ok = (base + jax.lax.broadcasted_iota(
        jnp.int32, (rn, 1), 0)) < n_alive
    tmax = aux_ref[:, 0:1]
    box = _slab_hit(feats_ref[:], cbox_ref, j, tmax) & lane_ok

    @pl.when(jnp.any(box & ~blocked) & tile_live)
    def _test():
        quad = jnp.dot(feats_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        valid, _ = _accept(quad, aux_ref[:], tmax, k)
        any_b = jnp.max(jnp.where(valid & box, 1.0, 0.0), axis=-1,
                        keepdims=True)
        out_ref[:] = jnp.broadcast_to(
            jnp.maximum(out_ref[:, 0:1], any_b), (rn, 8))


def _pad_rays(feats, aux, rn):
    n = feats.shape[0]
    pad = (-n) % rn
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, feats.shape[1]), feats.dtype)], 0)
        aux = jnp.concatenate(
            [aux, jnp.zeros((pad, aux.shape[1]), aux.dtype)], 0)
    return feats, aux, n


@functools.partial(
    jax.jit, static_argnames=("k", "anyhit", "n_sph", "full_phi",
                              "interpret"))
def _run(w_clusters, cbox, feats, aux, sph_tab, k: int, anyhit: bool,
         n_sph: int, full_phi: bool, interpret: bool):
    c = w_clusters.shape[0]
    rn = _RAY_TILE
    feats, aux, n = _pad_rays(feats, aux, rn)
    np_ = feats.shape[0]
    w_flat = w_clusters.reshape(c * 16, 4 * k)
    if sph_tab is None:
        sph_tab = jnp.zeros((1, 24), jnp.float32)
    ns_rows = sph_tab.shape[0]

    kern = _anyhit_kernel if anyhit else _closest_kernel
    out = pl.pallas_call(
        functools.partial(kern, k=k, rn=rn, n_sph=n_sph,
                          full_phi=full_phi),
        grid=(np_ // rn, c),
        in_specs=[
            pl.BlockSpec((rn, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rn, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns_rows, 24), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rn, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * 16 * 4 * k * c,
            bytes_accessed=(np_ // rn) * c * 16 * 4 * k * 4
            + np_ * (16 + 8 + 8) * 4,
            transcendentals=0),
        interpret=interpret,
    )(feats, aux, cbox, w_flat, sph_tab)
    return out[:n]


def _make_aux(o, tmax, n_alive, period: int = 0):
    """[N,8] per-ray aux block: col 0 = tmax, col 1 = relative t
    epsilon (self-hit guard scaled by |o|, ref triangle.rs:431-451),
    col 2 = n_alive broadcast (compaction bound), col 3 = block period
    (batched instancing: n_alive applies per `period`-ray block; 0 =
    flat).  period must be a multiple of the ray tile."""
    n = o.shape[0]
    teps = 1e-5 * (1.0 + jnp.max(jnp.abs(o), axis=-1))
    if n_alive is None:
        n_alive = jnp.int32(n)
        period = 0
    if period and period % _RAY_TILE != 0:
        # a tile straddling two blocks cannot use the bound
        n_alive = jnp.int32(n)
        period = 0
    na = jnp.broadcast_to(
        jnp.asarray(n_alive, jnp.float32).reshape(()), (n,))
    pd = jnp.full((n,), jnp.float32(period))
    return jnp.stack(
        [tmax.astype(jnp.float32), teps, na, pd] + [jnp.zeros((n,))] * 4,
        axis=-1)


def intersect_clusters(w_clusters, cbox, o, d, tmax, n_alive=None,
                       period: int = 0, sph_tab=None,
                       full_phi: bool = False,
                       interpret: bool = False):
    """Closest hit of N rays against the cluster tables (+ optional
    analytic spheres tested in the same kernel).

    Returns (t [N], slot [N] int32): slot = cluster*K + lane into the
    cluster layout; -1 = miss; -(2+s) = hit on sphere s of sph_tab
    (row layout w2o(16) radius zmin zmax phimax pad4).
    Rays at positions >= n_alive are reported as misses.
    """
    w_clusters = jnp.asarray(w_clusters)
    cbox = jnp.asarray(cbox)
    k = w_clusters.shape[-1] // 4
    feats = ray_features(o, d)
    aux = _make_aux(o, tmax, n_alive, period)
    n_sph = 0 if sph_tab is None else sph_tab.shape[0]
    if sph_tab is not None:
        sph_tab = jnp.asarray(sph_tab)
    out = _run(w_clusters, cbox, feats, aux, sph_tab, k, False,
               n_sph, full_phi, interpret)
    slot = out[:, 1].astype(jnp.int32)
    t = jnp.where(slot == -1, tmax, out[:, 0])
    return t, slot


def occluded_clusters(w_clusters, cbox, o, d, tmax, n_alive=None,
                      period: int = 0, sph_tab=None,
                      full_phi: bool = False,
                      interpret: bool = False):
    """Any-hit within (0, tmax); rays >= n_alive report unblocked."""
    w_clusters = jnp.asarray(w_clusters)
    cbox = jnp.asarray(cbox)
    k = w_clusters.shape[-1] // 4
    feats = ray_features(o, d)
    aux = _make_aux(o, tmax, n_alive, period)
    n_sph = 0 if sph_tab is None else sph_tab.shape[0]
    if sph_tab is not None:
        sph_tab = jnp.asarray(sph_tab)
    out = _run(w_clusters, cbox, feats, aux, sph_tab, k, True,
               n_sph, full_phi, interpret)
    return out[:, 0] > 0.5
