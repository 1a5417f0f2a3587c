"""Pallas mega-kernel for the BSDF mixture sample
(slots.bsdf_sample) — an op-count optimization for the tunneled TPU.

Device traces (DESIGN.md §9) show this device pays a large fixed cost
per executed HLO op; the slot-table sample sweep is a few hundred
small elementwise fusions per bounce.  Packing the whole mixture
sample into ONE pallas_call turns those into a single ~3 ms launch.
The kernel body reuses the exact slots.py math (slot_sample + the
re-accumulation sweeps) on VMEM-resident blocks, so semantics are
identical to the XLA path; parity is tested in
tests/test_pallas_shade.py and selection is explicit
(ARENDUR_SHADE=pallas|xla, default pallas on TPU backends).
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


def _pack(b: sl.BsdfSlots, wow, u):
    k = b.nslots
    cols = [
        b.ns, b.ts, b.bs, b.ng,                       # 0:12
        b.eta[:, None],                               # 12
        b.type.astype(jnp.float32),                   # 13:13+k
        b.kind.astype(jnp.float32),                   # +k
        b.dist.astype(jnp.float32),                   # +k
        b.c0.reshape(b.c0.shape[0], -1),              # +3k
        b.c1.reshape(b.c1.shape[0], -1),              # +3k
        b.p0, b.p1, b.p2,                             # +3k
        wow, u,                                       # +5
    ]
    return jnp.concatenate(cols, axis=1)


def _unpack(x, k):
    n = x.shape[0]
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
    # colors stay 2-D [N,3K] (Mosaic has no 3-D reshape); slots.py's
    # _col3 accepts the flattened layout
    c0 = take(3 * k)
    c1 = take(3 * k)
    p0 = take(k); p1 = take(k); p2 = take(k)
    wow = take(3); u = take(2)
    return (sl.BsdfSlots(ns=ns, ts=ts, bs=bs, ng=ng, eta=eta,
                         type=stype, kind=kind, dist=dist,
                         c0=c0, c1=c1, p0=p0, p1=p1, p2=p2,
                         present=None),
            wow, u)


def _kernel(x_ref, o_ref, *, k: int, types: int, present):
    b, wow, u = _unpack(x_ref[:], k)
    b = b.replace(present=present) if present is not None else b
    f, wiw, pdf, skind = sl.bsdf_sample(b, wow, u, types)
    o_ref[:] = jnp.concatenate(
        [f, wiw, pdf[:, None], skind.astype(jnp.float32)[:, None]],
        axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "types", "present", "interpret"))
def _run(x, k, types, present, interpret):
    n = x.shape[0]
    pad = (-n) % _RN
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    np_ = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, types=types, present=present),
        grid=(np_ // _RN,),
        in_specs=[pl.BlockSpec((_RN, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_RN, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 8), jnp.float32),
        interpret=interpret,
    )(x)
    return out[:n]


def bsdf_sample(b: sl.BsdfSlots, wow, u, types: int = sl.ALL,
                interpret: bool = False):
    """Drop-in kernelized slots.bsdf_sample (same return contract)."""
    x = _pack(b, wow, u)
    out = _run(x, b.nslots, types, b.present, interpret)
    return (out[:, 0:3], out[:, 3:6], out[:, 6],
            out[:, 7].astype(jnp.int32))
