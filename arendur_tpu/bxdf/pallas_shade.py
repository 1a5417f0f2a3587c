"""Pallas mega-kernels for the BSDF slot sweeps — the op-count
optimization that dominates wavefront shading on the tunneled TPU.

Device traces (DESIGN.md §9) show this device pays a large fixed cost
per executed HLO op; the slot-table sweeps (mixture sample for path
continuation, fused evaluate+pdf for NEE) are a few hundred small
elementwise fusions per bounce.  Packing each sweep into ONE
pallas_call turns those into a single kernel launch.  The kernel
bodies reuse the exact slots.py math on VMEM-resident blocks, so
semantics are identical to the XLA path; parity is tested in
tests/test_pallas_shade.py and selection is explicit
(ARENDUR_SHADE=pallas|xla, default pallas on TPU backends — see
use_pallas_shade and the integrator wiring).

Gradients: pallas_call has no autodiff rule, so both entry points are
jax.custom_vjp functions whose forward runs the kernel and whose
backward re-derives the VJP through the XLA slots.py path (identical
math, f32-roundoff-level primal agreement).  The detached-sampling
estimator only needs f/pdf cotangents; sampled directions are
stop_gradient'ed in slots.py either way.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arendur_tpu.bxdf import slots as sl

# 256-lane ray tiles: a [2048]-wide block needs 16 native (8,128)
# registers per vector op, exploding Mosaic's unrolled op count and
# its compile time (>15 min); 256 matches pallas_intersect's tile.
_RN = 256


def use_pallas_shade() -> bool:
    forced = os.environ.get("ARENDUR_SHADE", "auto")
    if forced == "pallas":
        return True
    if forced != "auto":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# packing helpers: BsdfSlots <-> one [N, C] f32 block (colors kept in
# the flattened [N,3K] layout — Mosaic has no 3-D reshape)
# ---------------------------------------------------------------------------

def _pack_bsdf(b: sl.BsdfSlots):
    c0 = b.c0 if b.c0.ndim == 2 else b.c0.reshape(b.c0.shape[0], -1)
    c1 = b.c1 if b.c1.ndim == 2 else b.c1.reshape(b.c1.shape[0], -1)
    return jnp.concatenate([
        b.ns, b.ts, b.bs, b.ng,                       # 0:12
        b.eta[:, None],                               # 12
        b.type.astype(jnp.float32),                   # 13:13+k
        b.kind.astype(jnp.float32),                   # +k
        b.dist.astype(jnp.float32),                   # +k
        c0, c1,                                       # +3k +3k
        b.p0, b.p1, b.p2,                             # +3k
    ], axis=1)


def _bsdf_cols(k: int) -> int:
    return 13 + 12 * k


def _unpack_bsdf(x, k, present, dists=None):
    o = 0

    def take(w):
        nonlocal o
        out = x[:, o:o + w]
        o += w
        return out

    ns = take(3); ts = take(3); bs = take(3); ng = take(3)
    eta = take(1)[:, 0]
    stype = take(k).astype(jnp.int32)
    kind = take(k).astype(jnp.int32)
    dist = take(k).astype(jnp.int32)
    c0 = take(3 * k)
    c1 = take(3 * k)
    p0 = take(k); p1 = take(k); p2 = take(k)
    return sl.BsdfSlots(ns=ns, ts=ts, bs=bs, ng=ng, eta=eta,
                        type=stype, kind=kind, dist=dist,
                        c0=c0, c1=c1, p0=p0, p1=p1, p2=p2,
                        present=present, dists=dists), x[:, o:]


# XLA places a pallas_call's whole operands+results in scoped VMEM
# when they fit (16 MiB); cap each launch so in+out stays under it
_SCOPED_VMEM_BYTES = 12 << 20


def _pad_run(kern, x, out_cols, interpret):
    """Tile a [N, C] block through a kernel producing [N, out_cols],
    slicing the wave into launches whose I/O fits scoped VMEM."""
    n = x.shape[0]
    pad = (-n) % _RN
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    np_ = x.shape[0]
    per_lane = 4 * (x.shape[1] + out_cols)
    max_lanes = max(_RN, (_SCOPED_VMEM_BYTES // per_lane) // _RN * _RN)

    def launch(xs):
        ns = xs.shape[0]
        return pl.pallas_call(
            kern,
            grid=(ns // _RN,),
            in_specs=[pl.BlockSpec((_RN, xs.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_RN, out_cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ns, out_cols), jnp.float32),
            interpret=interpret,
        )(xs)

    if np_ <= max_lanes:
        return launch(x)[:n]
    outs = [launch(x[s:s + max_lanes])
            for s in range(0, np_, max_lanes)]
    return jnp.concatenate(outs, 0)[:n]


# ---------------------------------------------------------------------------
# mixture sample (slots.bsdf_sample)
# ---------------------------------------------------------------------------

def _sample_kernel(x_ref, o_ref, *, k: int, types: int, present,
                   dists):
    b, rest = _unpack_bsdf(x_ref[:], k, present, dists)
    wow, u = rest[:, 0:3], rest[:, 3:5]
    f, wiw, pdf, skind = sl.bsdf_sample(b, wow, u, types)
    o_ref[:] = jnp.concatenate(
        [f, wiw, pdf[:, None], skind.astype(jnp.float32)[:, None]],
        axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "types", "present", "dists",
                                    "interpret"))
def _sample_run(x, k, types, present, dists, interpret):
    return _pad_run(
        functools.partial(_sample_kernel, k=k, types=types,
                          present=present, dists=dists), x, 8,
        interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bsdf_sample(b: sl.BsdfSlots, wow, u, types: int = sl.ALL,
                interpret: bool = False):
    """Drop-in kernelized slots.bsdf_sample (same return contract)."""
    x = jnp.concatenate([_pack_bsdf(b), wow, u], axis=1)
    out = _sample_run(x, b.nslots, types, b.present, b.dists,
                      interpret)
    return (out[:, 0:3], out[:, 3:6], out[:, 6],
            out[:, 7].astype(jnp.int32))


def _sample_fwd(b, wow, u, types, interpret):
    return bsdf_sample(b, wow, u, types, interpret), (b, wow, u)


def _sample_bwd(types, interpret, res, ct):
    b, wow, u = res
    _, vjp = jax.vjp(
        lambda b_, w_, u_: sl.bsdf_sample(b_, w_, u_, types)[:3],
        b, wow, u)
    return vjp(ct[:3])


bsdf_sample.defvjp(_sample_fwd, _sample_bwd)


# ---------------------------------------------------------------------------
# fused evaluate + pdf (slots.bsdf_eval_pdf — the NEE light branch)
# ---------------------------------------------------------------------------

def _eval_pdf_kernel(x_ref, o_ref, *, k: int, types: int, present,
                     dists):
    b, rest = _unpack_bsdf(x_ref[:], k, present, dists)
    wow, wiw = rest[:, 0:3], rest[:, 3:6]
    f, pdf = sl.bsdf_eval_pdf(b, wow, wiw, types)
    o_ref[:] = jnp.concatenate(
        [f, pdf[:, None], jnp.zeros((f.shape[0], 4), jnp.float32)],
        axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "types", "present", "dists",
                                    "interpret"))
def _eval_pdf_run(x, k, types, present, dists, interpret):
    return _pad_run(
        functools.partial(_eval_pdf_kernel, k=k, types=types,
                          present=present, dists=dists), x, 8,
        interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bsdf_eval_pdf(b: sl.BsdfSlots, wow, wiw, types: int = sl.ALL,
                  interpret: bool = False):
    """Drop-in kernelized slots.bsdf_eval_pdf (same return contract)."""
    x = jnp.concatenate([_pack_bsdf(b), wow, wiw], axis=1)
    out = _eval_pdf_run(x, b.nslots, types, b.present, b.dists,
                        interpret)
    return out[:, 0:3], out[:, 3]


def _eval_pdf_fwd(b, wow, wiw, types, interpret):
    return bsdf_eval_pdf(b, wow, wiw, types, interpret), (b, wow, wiw)


def _eval_pdf_bwd(types, interpret, res, ct):
    b, wow, wiw = res
    _, vjp = jax.vjp(
        lambda b_, w_, wi_: sl.bsdf_eval_pdf(b_, w_, wi_, types),
        b, wow, wiw)
    return vjp(ct)


bsdf_eval_pdf.defvjp(_eval_pdf_fwd, _eval_pdf_bwd)


# ---------------------------------------------------------------------------
# dispatch: kernel on TPU backends, XLA path elsewhere (and under
# ARENDUR_SHADE=xla).  The integrator and NEE call these.
# ---------------------------------------------------------------------------

def _interp() -> bool:
    return os.environ.get("ARENDUR_PALLAS_INTERPRET", "0") == "1"


def dispatch_sample(b: sl.BsdfSlots, wow, u, types: int = sl.ALL):
    if use_pallas_shade():
        return bsdf_sample(b, wow, u, types, _interp())
    return sl.bsdf_sample(b, wow, u, types)


def dispatch_eval_pdf(b: sl.BsdfSlots, wow, wiw, types: int = sl.ALL):
    if use_pallas_shade():
        return bsdf_eval_pdf(b, wow, wiw, types, _interp())
    return sl.bsdf_eval_pdf(b, wow, wiw, types)
