"""The per-bounce shade mega-kernel: ONE Pallas launch for everything
between closest-hit and the shadow query.

The tunneled TPU pays a large fixed cost per executed HLO op
(DESIGN.md §9.1), so the wavefront bounce — emission collection,
material recipe, NEE light sampling + MIS, BSDF mixture sampling,
deferred-MIS weight, beta/Russian-roulette update — is fused into one
kernel whose body calls the SAME row-level functions as the XLA path
(materials.build_slots, nee.light_sample_rows / direct_light_contrib /
path_mis_weight_rows, slots.bsdf_sample / bsdf_eval_pdf), so semantics
are shared by construction.  Per bounce the device then executes:
compaction ops + closest-hit kernel + a few gathers + THIS kernel +
the any-hit shadow kernel + one masked add.

Eligibility (host-checked by the integrator): TPU backend, no image
textures (texture lookups are HBM gathers and stay outside), no
emission-profile textures, full-phi sphere lights (the phi clip needs
atan2, which has no Mosaic lowering).  Everything else falls back to
the identical XLA composition.

Gradients: custom_vjp whose backward runs jax.vjp over the same body
outside Pallas (identical math, f32-roundoff agreement).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arendur_tpu import materials as mats
from arendur_tpu import spectrum as spec
from arendur_tpu import scene as sc
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import ALL, ALL_NON_SPECULAR, SPECULAR
from arendur_tpu.geometry.vec import dot, length2
from arendur_tpu.lighting import nee

_RN = 512
_SCOPED_VMEM_BYTES = 10 << 20

OUT_COLS = 32


def default_interpret() -> bool:
    """ARENDUR_PALLAS_INTERPRET=1 runs the kernels in interpret mode
    (CPU parity tests of the TPU-forced paths)."""
    return os.environ.get("ARENDUR_PALLAS_INTERPRET", "0") == "1"

# fixed input column layout (before the variable-width light row)
_POS = slice(0, 3)
_PERR = slice(3, 6)
_NG = slice(6, 9)
_NS = slice(9, 12)
_DPDU = slice(12, 15)
_HIT = 15
_LIGHT_ID = 16
_LE = slice(17, 20)
_MTYPE = 20
_KD = slice(21, 24)
_KS = slice(24, 27)
_SIGMA = 27
_ROUGH = 28
_ETA = 29
_DISSOLVE = 30
_D = slice(31, 34)
_BETA = slice(34, 37)
_L = slice(37, 40)
_SPECULAR = 40
_SEL_PREV = 41
_WB_PREV = 42
_NEE_PREV = 43
_ALIVE = 44
_LIDX = 45
_SELPDF = 46
_U_LIGHT = slice(47, 49)
_U_BSDF = slice(49, 51)
_U_RR = 51
_BOUNCE = 52
_LROW0 = 53


def _body(x, *, presence, dist_sets, lcidx, lpresent, min_depth,
          rr_threshold, full_phi):
    """Pure-jnp bounce shade over packed columns x [N, 53+Cl].

    Mirrors integrator.bounce_step steps (2)-(5) exactly; returns
    [N, OUT_COLS] (see unpack_out for the layout)."""
    pos = x[:, _POS]
    pos_err = x[:, _PERR]
    ng = x[:, _NG]
    ns = x[:, _NS]
    dpdu = x[:, _DPDU]
    hitmask = x[:, _HIT] > 0.5
    light_id = x[:, _LIGHT_ID].astype(jnp.int32)
    le = x[:, _LE]
    mtype = x[:, _MTYPE].astype(jnp.int32)
    kd = x[:, _KD]
    ks = x[:, _KS]
    sigma = x[:, _SIGMA]
    rough = x[:, _ROUGH]
    eta = x[:, _ETA]
    dissolve = x[:, _DISSOLVE]
    d = x[:, _D]
    beta = x[:, _BETA]
    L = x[:, _L]
    specular = x[:, _SPECULAR] > 0.5
    sel_prev = x[:, _SEL_PREV].astype(jnp.int32)
    wb_prev = x[:, _WB_PREV]
    nee_prev = x[:, _NEE_PREV] > 0.5
    alive = x[:, _ALIVE] > 0.5
    lidx = x[:, _LIDX].astype(jnp.int32)
    selpdf = x[:, _SELPDF]
    u_light = x[:, _U_LIGHT]
    u_bsdf = x[:, _U_BSDF]
    u_rr = x[:, _U_RR]
    bounce = x[:, _BOUNCE]
    lrow = x[:, _LROW0:]
    cidx = dict(lcidx)

    lane_active = alive & hitmask

    # (2) emitted radiance (integrator.bounce_step: emit block)
    emit_gate = lane_active & (light_id >= 0)
    w_emit = jnp.where((bounce == 0.0) | specular, 1.0, 0.0) \
        + jnp.where(nee_prev & (light_id == sel_prev), wb_prev, 0.0)
    L = L + jnp.where(emit_gate[..., None], w_emit[..., None]
                      * beta * le, 0.0)

    # (3) scattering + NEE
    wo = -d
    bsdf = mats.build_slots(mtype, kd, ks, sigma, rough, eta, dissolve,
                            ns, ng, dpdu, presence, flat_colors=True,
                            dist_sets=dist_sets)
    do_nee = lane_active & (sl.match_count(bsdf, ALL_NON_SPECULAR) > 0)
    ls = nee.light_sample_rows(lrow, cidx, lpresent, pos, u_light,
                               need_uv=False,
                               full_phi_spheres=full_phi)
    f_raw, spdf = sl.bsdf_eval_pdf(bsdf, wo, ls["wi"], ALL)
    contrib, need_shadow = nee.direct_light_contrib(ls, f_raw, spdf,
                                                    bsdf.ns)
    inv_sel = 1.0 / jnp.maximum(selpdf, 1e-20)
    contrib_out = jnp.where(do_nee[..., None],
                            beta * contrib * inv_sel[..., None], 0.0)
    need_sh_out = need_shadow & do_nee
    # shadow ray (nee._occlusion_query minus the query itself)
    d_sh = ls["pfrom"] - pos
    o_sh = sc.offset_ray_origin(pos, pos_err, ng, d_sh)
    seg = ls["pfrom"] - o_sh
    dist = jnp.sqrt(jnp.maximum(length2(seg), 1e-20))
    dirn = seg / dist[..., None]
    sh_t = dist * (1.0 - 1e-3)

    # (4) bsdf sample for path continuation
    f, wi, pdf, kind = sl.bsdf_sample(bsdf, wo, u_bsdf, ALL)
    cont = lane_active & ~spec.is_black(f) & (pdf > 0.0)
    # boolean algebra, not where-on-bool (Mosaic can't truncate i8->i1)
    spec_new = (kind & SPECULAR) != 0
    specular = (lane_active & spec_new) | (~lane_active & specular)
    wb = nee.path_mis_weight_rows(lrow, cidx, lpresent, selpdf, pos,
                                  wi, pdf, kind, f,
                                  full_phi_spheres=full_phi)
    sel_prev = jnp.where(lane_active, lidx, sel_prev)
    wb_prev = jnp.where(lane_active, wb, wb_prev)
    nee_prev = do_nee
    ratio = jnp.abs(dot(wi, bsdf.ns)) / jnp.maximum(pdf, 1e-20)
    overflow = ratio > 1e12
    cont = cont & ~overflow
    ratio = jnp.where(cont, jnp.minimum(ratio, 1e12), 0.0)
    new_beta = beta * f * ratio[..., None]
    beta_ok = spec.valid(new_beta)
    beta = jnp.where((cont & beta_ok)[..., None], new_beta, beta)
    alive = lane_active & cont & beta_ok

    o = sc.offset_ray_origin(pos, pos_err, ng, wi)
    degenerate = (wi[..., 0]**2 + wi[..., 1]**2 + wi[..., 2]**2) < 1e-12
    zero = jnp.zeros_like(wi[..., 0])
    fallback = jnp.stack([zero, zero, jnp.ones_like(zero)], -1)
    d_out = jnp.where(degenerate[..., None], fallback, wi)
    alive = alive & ~degenerate

    # (5) russian roulette
    lum = spec.luminance(beta)
    q = max(rr_threshold, 0.05)
    rr_active = (bounce + 1.0) >= float(min_depth)
    roulette = rr_active & (lum < rr_threshold)
    killed = roulette & (u_rr < q)
    beta = jnp.where((roulette & ~killed)[..., None],
                     beta / (1.0 - q), beta)
    alive = alive & ~killed

    b1 = lambda m: jnp.where(m, 1.0, 0.0)[:, None]
    return jnp.concatenate([
        o, d_out, L, beta,
        b1(alive), b1(specular),
        sel_prev.astype(jnp.float32)[:, None],
        wb_prev[:, None], b1(nee_prev),
        o_sh, dirn, sh_t[:, None], b1(need_sh_out),
        contrib_out,
        jnp.zeros((x.shape[0], OUT_COLS - 28), jnp.float32),
    ], axis=1)


def unpack_out(out):
    """Kernel output columns -> dict."""
    return dict(
        o=out[:, 0:3], d=out[:, 3:6], L=out[:, 6:9], beta=out[:, 9:12],
        alive=out[:, 12] > 0.5, specular=out[:, 13] > 0.5,
        sel_prev=out[:, 14].astype(jnp.int32), wb_prev=out[:, 15],
        nee_prev=out[:, 16] > 0.5,
        sh_o=out[:, 17:20], sh_d=out[:, 20:23], sh_t=out[:, 23],
        need_shadow=out[:, 24] > 0.5, contrib=out[:, 25:28])


def _kernel(x_ref, o_ref, **cfg):
    o_ref[:] = _body(x_ref[:], **cfg)


@functools.partial(
    jax.jit, static_argnames=("presence", "dist_sets", "lcidx",
                              "lpresent", "min_depth", "rr_threshold",
                              "full_phi", "interpret"))
def _run(x, presence, dist_sets, lcidx, lpresent, min_depth,
         rr_threshold, full_phi, interpret):
    n = x.shape[0]
    pad = (-n) % _RN
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    np_ = x.shape[0]
    kern = functools.partial(
        _kernel, presence=presence, dist_sets=dist_sets, lcidx=lcidx,
        lpresent=lpresent, min_depth=min_depth,
        rr_threshold=rr_threshold, full_phi=full_phi)
    per_lane = 4 * (x.shape[1] + OUT_COLS)
    max_lanes = max(_RN, (_SCOPED_VMEM_BYTES // per_lane) // _RN * _RN)

    def launch(xs):
        ns_ = xs.shape[0]
        return pl.pallas_call(
            kern,
            grid=(ns_ // _RN,),
            in_specs=[pl.BlockSpec((_RN, xs.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_RN, OUT_COLS), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ns_, OUT_COLS), jnp.float32),
            interpret=interpret,
        )(xs)

    if np_ <= max_lanes:
        return launch(x)[:n]
    outs = [launch(x[s:s + max_lanes]) for s in range(0, np_, max_lanes)]
    return jnp.concatenate(outs, 0)[:n]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def bounce_shade(x, presence, dist_sets, lcidx, lpresent, min_depth,
                 rr_threshold, full_phi, interpret=False):
    """Kernelized bounce shade (see _body for the column contract)."""
    return _run(x, presence, dist_sets, lcidx, lpresent, min_depth,
                rr_threshold, full_phi, interpret)


def _fwd(x, presence, dist_sets, lcidx, lpresent, min_depth,
         rr_threshold, full_phi, interpret):
    return bounce_shade(x, presence, dist_sets, lcidx, lpresent,
                        min_depth, rr_threshold, full_phi, interpret), x


def _bwd(presence, dist_sets, lcidx, lpresent, min_depth, rr_threshold,
         full_phi, interpret, x, ct):
    _, vjp = jax.vjp(
        lambda x_: _body(x_, presence=presence, dist_sets=dist_sets,
                         lcidx=lcidx, lpresent=lpresent,
                         min_depth=min_depth,
                         rr_threshold=rr_threshold, full_phi=full_phi),
        x)
    return vjp(ct)


bounce_shade.defvjp(_fwd, _bwd)


def xla_reference(x, presence, dist_sets, lcidx, lpresent, min_depth,
                  rr_threshold, full_phi):
    """The same body outside Pallas — the parity oracle and the
    backward-pass twin."""
    return _body(x, presence=presence, dist_sets=dist_sets,
                 lcidx=lcidx, lpresent=lpresent, min_depth=min_depth,
                 rr_threshold=rr_threshold, full_phi=full_phi)
