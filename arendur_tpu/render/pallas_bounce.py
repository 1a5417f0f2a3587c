"""The per-bounce shade mega-kernel: ONE Pallas launch for everything
between closest-hit geometry resolution and the shadow query.

The tunneled TPU pays a large fixed cost per executed HLO op
(DESIGN.md §9.1), so the wavefront bounce — hit shading-info
construction (triangle barycentrics/frames + sphere fundamental
forms), emission collection, material recipe, NEE light sampling +
MIS, BSDF mixture sampling, deferred-MIS weight, beta/Russian-
roulette update — is fused into one kernel whose body calls the SAME
row-level functions as the XLA path (scene.tri_shading_from_row,
sphere.sphere_shading_from_row, materials.build_slots,
nee.light_sample_rows / direct_light_contrib / path_mis_weight_rows,
slots.bsdf_sample / bsdf_eval_pdf), so semantics are shared by
construction.  Per-lane table rows (materials, lights, spheres) are
selected IN-KERNEL by one-hot matmuls over the small scene tables —
no wavefront gathers, and the kernel input stays narrow (~58 cols).

Per bounce the device executes: compaction ops + the closest-hit
cluster kernel + one triangle-row gather + THIS kernel + the any-hit
shadow kernel + one masked add.

Eligibility (host-checked by the integrator): TPU backend, no image
textures (texture lookups are HBM gathers and stay outside), no
emission-profile textures, no instanced meshes.  Everything else
falls back to the identical XLA composition.

Gradients: custom_vjp whose backward runs jax.vjp over the same body
outside Pallas (identical math, f32-roundoff agreement) — including
cotangents for the material/light tables (the differentiable
parameters).
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
from arendur_tpu.geometry.vec import dot, cross, normalize, length2
from arendur_tpu.lighting import nee
from arendur_tpu.shapes import sphere as sph

_RN = 512
_SCOPED_VMEM_BYTES = 10 << 20

OUT_COLS = 32


def default_interpret() -> bool:
    """ARENDUR_PALLAS_INTERPRET=1 runs the kernels in interpret mode
    (CPU parity tests of the TPU-forced paths)."""
    return os.environ.get("ARENDUR_PALLAS_INTERPRET", "0") == "1"


# fixed input column layout (see integrator.bounce_step mega branch)
_O = slice(0, 3)
_D = slice(3, 6)
_T = 6
_HIT = 7
_IS_SPH = 8
_S_IDX = 9
_PLOCAL = slice(10, 13)
_TROW = slice(13, 39)
_BETA = slice(39, 42)
_L = slice(42, 45)
_SPECULAR = 45
_SEL_PREV = 46
_WB_PREV = 47
_NEE_PREV = 48
_ALIVE = 49
_LIDX = 50
_SELPDF = 51
_U_LIGHT = slice(52, 54)
_U_BSDF = slice(54, 56)
_U_RR = 56
_BOUNCE = 57
IN_COLS = 58


def _select_rows(tab, idx):
    """Per-lane row select from a small [R, C] table by one-hot
    matmul — the in-kernel replacement for a wavefront gather."""
    r = tab.shape[0]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], r), 1)
          == idx[:, None]).astype(jnp.float32)
    # HIGHEST precision: the default f32 matmul rounds operands to
    # bf16-class mantissas on real TPU (see geometry/transform.py:26),
    # which would corrupt every selected table row (light positions,
    # sphere o2w transforms, material params); CPU interpret-mode
    # parity can't catch it because CPU matmuls are exact f32.
    return jnp.dot(oh, tab, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _body(x, ltab, mtab, stab, *, presence, dist_sets, lcidx, lpresent,
          emi_cols, min_depth, rr_threshold, full_phi):
    """Pure-jnp bounce shade over packed columns x [N, IN_COLS] plus
    the scene's small tables (lights-pack [L,CL], materials [M,16],
    spheres [S,24] per sphere.shade_table).

    Mirrors integrator.bounce_step steps (2)-(5) exactly; returns
    [N, OUT_COLS] (see unpack_out for the layout)."""
    o_ray = x[:, _O]
    d = x[:, _D]
    hitmask = x[:, _HIT] > 0.5
    is_sph = x[:, _IS_SPH] > 0.5
    s_idx = x[:, _S_IDX].astype(jnp.int32)
    p_local = x[:, _PLOCAL]
    trow = x[:, _TROW]
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
    cidx = dict(lcidx)

    # ---- hit shading info (scene.intersect's post-kernel half) ------
    srow = _select_rows(stab, s_idx)
    b0, b1 = sc._bary_from_vertices(o_ray, d, trow[:, 0:3],
                                    trow[:, 3:6], trow[:, 6:9])
    (pos_t, perr_t, _uv_t, dpdu_t, dpdv_t, ns_raw) = \
        sc.tri_shading_from_row(trow, b0, b1)
    ng_t = normalize(cross(dpdu_t, dpdv_t))
    flip = dot(ns_raw, ng_t) < 0.0
    ns_t = jnp.where(flip[:, None], -ns_raw, ns_raw)
    pos_s, ng_s, dpdu_s, dpdv_s, perr_s = \
        sph.sphere_shading_from_row(srow, p_local)
    m3 = is_sph[:, None]
    pos = jnp.where(m3, pos_s, pos_t)
    pos_err = jnp.where(m3, perr_s, perr_t)
    ng = jnp.where(m3, ng_s, ng_t)
    ns = jnp.where(m3, ng_s, ns_t)
    dpdu = jnp.where(m3, dpdu_s, dpdu_t)
    mat_id = jnp.where(is_sph, srow[:, 20], trow[:, 24]).astype(
        jnp.int32)
    light_id = jnp.where(is_sph, srow[:, 21], trow[:, 25]).astype(
        jnp.int32)
    light_id = jnp.where(hitmask, light_id, -1)

    # material parameters (resolve_params' row, selected in-kernel)
    mrow = _select_rows(mtab, jnp.maximum(mat_id, 0))
    mtype = mrow[:, 0].astype(jnp.int32)
    kd = mrow[:, 1:4]
    ks = mrow[:, 4:7]
    sigma = mrow[:, 7]
    rough = mrow[:, 8]
    eta = mrow[:, 9]
    dissolve = mrow[:, 10]

    lane_active = alive & hitmask

    # (2) emitted radiance: le from the lights pack's emission block
    lerow = _select_rows(ltab, jnp.maximum(light_id, 0))
    le = lerow[:, emi_cols[0]:emi_cols[1]]
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
    lrow = _select_rows(ltab, jnp.maximum(lidx, 0))
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

    b1_ = lambda m: jnp.where(m, 1.0, 0.0)[:, None]
    return jnp.concatenate([
        o, d_out, L, beta,
        b1_(alive), b1_(specular),
        sel_prev.astype(jnp.float32)[:, None],
        wb_prev[:, None], b1_(nee_prev),
        o_sh, dirn, sh_t[:, None], b1_(need_sh_out),
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


def _kernel(x_ref, ltab_ref, mtab_ref, stab_ref, o_ref, **cfg):
    o_ref[:] = _body(x_ref[:], ltab_ref[:], mtab_ref[:], stab_ref[:],
                     **cfg)


@functools.partial(
    jax.jit, static_argnames=("presence", "dist_sets", "lcidx",
                              "lpresent", "emi_cols", "min_depth",
                              "rr_threshold", "full_phi", "interpret"))
def _run(x, ltab, mtab, stab, presence, dist_sets, lcidx, lpresent,
         emi_cols, min_depth, rr_threshold, full_phi, interpret):
    n = x.shape[0]
    pad = (-n) % _RN
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    np_ = x.shape[0]
    kern = functools.partial(
        _kernel, presence=presence, dist_sets=dist_sets, lcidx=lcidx,
        lpresent=lpresent, emi_cols=emi_cols, min_depth=min_depth,
        rr_threshold=rr_threshold, full_phi=full_phi)
    per_lane = 4 * (x.shape[1] + OUT_COLS)
    max_lanes = max(_RN, (_SCOPED_VMEM_BYTES // per_lane) // _RN * _RN)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)

    def launch(xs):
        ns_ = xs.shape[0]
        return pl.pallas_call(
            kern,
            grid=(ns_ // _RN,),
            in_specs=[
                pl.BlockSpec((_RN, xs.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                whole(ltab.shape), whole(mtab.shape), whole(stab.shape),
            ],
            out_specs=pl.BlockSpec((_RN, OUT_COLS), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ns_, OUT_COLS), jnp.float32),
            interpret=interpret,
        )(xs, ltab, mtab, stab)

    if np_ <= max_lanes:
        return launch(x)[:n]
    outs = [launch(x[s:s + max_lanes]) for s in range(0, np_, max_lanes)]
    return jnp.concatenate(outs, 0)[:n]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def bounce_shade(x, ltab, mtab, stab, presence, dist_sets, lcidx,
                 lpresent, emi_cols, min_depth, rr_threshold,
                 full_phi, interpret=False):
    """Kernelized bounce shade (see _body for the column contract)."""
    if os.environ.get("ARENDUR_MEGA_NOOP") == "1":
        # perf-ablation stub: pass rays through alive with unit
        # occupancy so downstream work stays realistic
        n = x.shape[0]
        one = jnp.ones((n, 1), jnp.float32)
        zero = jnp.zeros((n, 1), jnp.float32)
        return jnp.concatenate([
            x[:, _O], x[:, _D], jnp.zeros((n, 3)), x[:, _BETA],
            one, zero, zero, zero, one,
            x[:, _O], x[:, _D], one, one,
            jnp.zeros((n, 3)), jnp.zeros((n, OUT_COLS - 28))], axis=1)
    return _run(x, ltab, mtab, stab, presence, dist_sets, lcidx,
                lpresent, emi_cols, min_depth, rr_threshold, full_phi,
                interpret)


def _fwd(x, ltab, mtab, stab, presence, dist_sets, lcidx, lpresent,
         emi_cols, min_depth, rr_threshold, full_phi, interpret):
    out = bounce_shade(x, ltab, mtab, stab, presence, dist_sets, lcidx,
                       lpresent, emi_cols, min_depth, rr_threshold,
                       full_phi, interpret)
    return out, (x, ltab, mtab, stab)


def _bwd(presence, dist_sets, lcidx, lpresent, emi_cols, min_depth,
         rr_threshold, full_phi, interpret, res, ct):
    x, ltab, mtab, stab = res
    _, vjp = jax.vjp(
        lambda x_, lt_, mt_, st_: _body(
            x_, lt_, mt_, st_, presence=presence, dist_sets=dist_sets,
            lcidx=lcidx, lpresent=lpresent, emi_cols=emi_cols,
            min_depth=min_depth, rr_threshold=rr_threshold,
            full_phi=full_phi),
        x, ltab, mtab, stab)
    return vjp(ct)


bounce_shade.defvjp(_fwd, _bwd)


def xla_reference(x, ltab, mtab, stab, presence, dist_sets, lcidx,
                  lpresent, emi_cols, min_depth, rr_threshold,
                  full_phi):
    """The same body outside Pallas — the parity oracle and the
    backward-pass twin."""
    return _body(x, ltab, mtab, stab, presence=presence,
                 dist_sets=dist_sets, lcidx=lcidx, lpresent=lpresent,
                 emi_cols=emi_cols, min_depth=min_depth,
                 rr_threshold=rr_threshold, full_phi=full_phi)
