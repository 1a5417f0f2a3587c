"""Lane-transposed (component-form) bounce mega-kernel.

The round-4 mega-kernel (render/pallas_bounce.py) fused the whole
bounce shade into one Pallas launch, but its ``[N, 3]`` vector math
tiles to (8, 128) vregs at 3/128 lane utilization — the measured
~30x gap to the scalar-op floor (DESIGN.md §9.5).  This module is the
same bounce body reformulated in COMPONENT FORM: the wave enters the
kernel as ``[IN_COLS, N/128, 128]`` so every per-lane field is a
(R, 128) array — full vregs, every op at full lane occupancy.

Structure:

* the shading math lives in render/cmath.py (vec3 = tuple of lane
  arrays); this module adds the scene/NEE/material-recipe twins and
  the bounce body `cbody`, then wraps it in a pallas_call;
* scene tables (lights pack / materials / spheres) ride in SMEM and
  rows are selected per-lane by static where-chains over the (small)
  row count — the component-form replacement for pallas_bounce's
  one-hot matmul (host-gated: tables must be <= _MAX_TABLE_ROWS);
* parity is BY TEST, not by construction: the row-level functions in
  scene.py / nee.py / slots.py / materials.py remain the oracles and
  tests/test_cbounce.py fuzzes each stage + gates the full body and
  the interpret-mode kernel against pallas_bounce._body;
* gradients: custom_vjp whose backward runs jax.vjp over the SAME
  component body as plain XLA (identical math, f32 roundoff), with
  cotangents for the material/light/sphere tables.

Reference hot loop being replaced: /root/reference/src/renderer/
pt.rs:55-125 (+ scene.rs:58-167 NEE, bsdf.rs:100-144 sampling).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arendur_tpu.render import cmath as cm
from arendur_tpu.render.cmath import (
    vadd, vsub, vneg, vscale, vdot, vcross, vnormalize, vwhere,
    vzero_like, vlength2)
from arendur_tpu.bxdf.types import (
    ALL, ALL_NON_SPECULAR, SPECULAR, KIND_OF_TYPE,
    T_LAMBERT_R, T_LAMBERT_T, T_OREN_NAYAR, T_FRESNEL_SPEC,
    T_TS_R, T_TS_T, T_ASHIKHMIN)
from arendur_tpu import materials as mats
from arendur_tpu import scene as sc
from arendur_tpu.shapes import sphere as sph

# fixed input/output column layout — shared with pallas_bounce so the
# integrator packs once and either kernel can consume it (transposed)
from arendur_tpu.render import pallas_bounce as pb

PI = float(jnp.pi)
IN_COLS = pb.IN_COLS
OUT_COLS = pb.OUT_COLS
_LANE = 128
_RN = 1024                  # rays per kernel tile -> (8, 128) fields
_MAX_TABLE_ROWS = 32        # SMEM row-select is O(rows) per column

_GAMMA7 = 7.0 * 2.0 ** -24 / (1.0 - 7.0 * 2.0 ** -24)


def enabled() -> bool:
    """ARENDUR_CBOUNCE=0 falls back to the row-form mega kernel."""
    return os.environ.get("ARENDUR_CBOUNCE", "1") == "1"


# ---------------------------------------------------------------------------
# per-lane table-row select
# ---------------------------------------------------------------------------

class CRow:
    """Lazy per-lane row select from a small [R, C] table.

    `at(r, c)` returns the table element as a (broadcastable) scalar —
    an SMEM read inside the kernel, a 0-d array slice in XLA.  Columns
    are selected by a static where-chain over the R rows and cached,
    so each needed column costs exactly R lane-ops once."""

    def __init__(self, at, nrows: int, idx, cidx=None):
        self._at = at
        self._n = nrows
        self._idx = idx
        self._cidx = cidx
        self._cache = {}

    def col_abs(self, j: int):
        if j in self._cache:
            return self._cache[j]
        ones = jnp.ones_like(self._idx, jnp.float32)
        out = ones * self._at(0, j)
        for r in range(1, self._n):
            out = jnp.where(self._idx == r, self._at(r, j), out)
        self._cache[j] = out
        return out

    def col1(self, name: str, ofs: int = 0):
        return self.col_abs(self._cidx[name][0] + ofs)

    def col3(self, name: str):
        lo = self._cidx[name][0]
        return (self.col_abs(lo), self.col_abs(lo + 1),
                self.col_abs(lo + 2))

    def col16(self, name: str):
        lo = self._cidx[name][0]
        return tuple(self.col_abs(lo + j) for j in range(16))


# ---------------------------------------------------------------------------
# geometry twins (scene.py / shapes/)
# ---------------------------------------------------------------------------

def bary_from_vertices(o, d, v0, v1, v2):
    """Twin: scene._bary_from_vertices."""
    e1 = vsub(v1, v0)
    e2 = vsub(v2, v0)
    pvec = vcross(d, e2)
    det = vdot(e1, pvec)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    tvec = vsub(o, v0)
    u = vdot(tvec, pvec) * inv
    v = vdot(d, vcross(tvec, e1)) * inv
    return 1.0 - u - v, u


def tri_dpduv(v0, v1, v2, uv0, uv1, uv2):
    """Twin: triangle.tri_dpduv.  uv* are (u, v) tuples."""
    duv02 = (uv0[0] - uv2[0], uv0[1] - uv2[1])
    duv12 = (uv1[0] - uv2[0], uv1[1] - uv2[1])
    dp02 = vsub(v0, v2)
    dp12 = vsub(v1, v2)
    det = duv02[0] * duv12[1] - duv02[1] * duv12[0]
    ok = det != 0.0
    inv = 1.0 / jnp.where(ok, det, 1.0)
    dpdu = vscale(vsub(vscale(dp02, duv12[1]), vscale(dp12, duv02[1])),
                  inv)
    dpdv = vscale(vadd(vscale(dp02, -duv12[0]), vscale(dp12, duv02[0])),
                  inv)
    ng = vcross(dp02, vsub(v0, v1))
    fb_u = vnormalize(dp02)
    fb_v = vnormalize(vcross(ng, dp02))
    return vwhere(ok, dpdu, fb_u), vwhere(ok, dpdv, fb_v)


def tri_shading_from_row(tcol, b0, b1):
    """Twin: scene.tri_shading_from_row.  tcol(j) returns the j-th of
    the 26 packed triangle-attribute columns (already per-lane)."""
    v0 = (tcol(0), tcol(1), tcol(2))
    v1 = (tcol(3), tcol(4), tcol(5))
    v2 = (tcol(6), tcol(7), tcol(8))
    b2 = 1.0 - b0 - b1
    pos = vadd(vadd(vscale(v0, b0), vscale(v1, b1)), vscale(v2, b2))
    perr = vscale(vadd(vadd(cm.vabs(vscale(v0, b0)),
                            cm.vabs(vscale(v1, b1))),
                       cm.vabs(vscale(v2, b2))), _GAMMA7)
    uv0 = (tcol(18), tcol(19))
    uv1 = (tcol(20), tcol(21))
    uv2 = (tcol(22), tcol(23))
    dpdu, dpdv = tri_dpduv(v0, v1, v2, uv0, uv1, uv2)
    n0 = (tcol(9), tcol(10), tcol(11))
    n1 = (tcol(12), tcol(13), tcol(14))
    n2 = (tcol(15), tcol(16), tcol(17))
    ns_raw = vnormalize(
        vadd(vadd(vscale(n0, b0), vscale(n1, b1)), vscale(n2, b2)))
    return pos, perr, dpdu, dpdv, ns_raw


def sphere_shading_from_row(srow: CRow, p_local):
    """Twin: sphere.sphere_shading_from_row (shade_table layout:
    o2w 0:16, radius 16, thetamin 17, thetamax 18, phimax 19)."""
    o2w = tuple(srow.col_abs(j) for j in range(16))
    radius = srow.col_abs(16)
    thetamin = srow.col_abs(17)
    thetamax = srow.col_abs(18)
    phimax = srow.col_abs(19)
    p = p_local
    thetadelta = thetamax - thetamin
    theta = cm.acos_poly(jnp.clip(p[2] / jnp.maximum(radius, 1e-20),
                                  -1.0 + 1e-7, 1.0 - 1e-7))
    inv_zr = 1.0 / jnp.sqrt(jnp.maximum(p[0] * p[0] + p[1] * p[1],
                                        1e-30))
    cphi = p[0] * inv_zr
    sphi = p[1] * inv_zr
    dpdu_l = (-phimax * p[1], phimax * p[0], jnp.zeros_like(phimax))
    dpdv_l = vscale((p[2] * cphi, p[2] * sphi,
                     -radius * jnp.sin(theta)), thetadelta)
    pos = cm.tp16(o2w, p)
    dpdu = cm.tv16(o2w, dpdu_l)
    dpdv = cm.tv16(o2w, dpdv_l)
    ng = vnormalize(vcross(dpdu, dpdv))
    pos_err = vscale(cm.vabs(pos), 5.0 * 2.0 ** -24)
    return pos, ng, dpdu, dpdv, pos_err


@jax.custom_jvp
def _nextafter(p, q):
    return jnp.nextafter(p, q)


@_nextafter.defjvp
def _nextafter_jvp(primals, tangents):
    # identity + one ulp (twin: scene._nextafter)
    p, q = primals
    dp, _ = tangents
    return jnp.nextafter(p, q), dp


def offset_ray_origin(pos, pos_err, n, d):
    """Twin: scene.offset_ray_origin (per-component)."""
    edn = (jnp.abs(n[0]) * pos_err[0] + jnp.abs(n[1]) * pos_err[1]
           + jnp.abs(n[2]) * pos_err[2])
    sgn = jnp.where(vdot(d, n) <= 0.0, -edn, edn)
    out = []
    for c in range(3):
        off = sgn * n[c]
        p = pos[c] + off
        up = _nextafter(p, jnp.full_like(p, jnp.inf))
        down = _nextafter(p, jnp.full_like(p, -jnp.inf))
        out.append(jnp.where(off > 0.0, up,
                             jnp.where(off < 0.0, down, p)))
    return tuple(out)


# ---------------------------------------------------------------------------
# NEE twins (lighting/nee.py)
# ---------------------------------------------------------------------------

def _sample_sphere_local_row(radius, zmin, zmax, thetamin, thetamax,
                             phimax, u2):
    """Twin: nee._sample_sphere_local_row (THETA_UNIFORM_COMPAT
    default)."""
    phi = u2[0] * phimax
    if sph.THETA_UNIFORM_COMPAT:
        theta = u2[1] * (thetamax - thetamin) + thetamin
    else:
        z = zmin / radius + u2[1] * (zmax - zmin) / radius
        theta = cm.acos_poly(jnp.clip(z, -1.0 + 1e-7, 1.0 - 1e-7))
    st = jnp.sin(theta)
    nrm = (st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta))
    p = vscale(nrm, radius)
    area = phimax * radius * (zmax - zmin)
    return p, nrm, 1.0 / area


def light_sample_rows(lrow: CRow, present, pos, u2,
                      full_phi_spheres: bool = False):
    """Twin: nee.light_sample_rows (need_uv=False path)."""
    has = lambda t: present is None or t in present
    lt = lrow.col1("ltype").astype(jnp.int32)
    emission = lrow.col3("emission")
    sg = jax.lax.stop_gradient
    sgv = lambda v: (sg(v[0]), sg(v[1]), sg(v[2]))
    zero1 = jnp.zeros_like(pos[0])
    zero3 = (zero1, zero1, zero1)

    if has(sc.L_AREA_SPHERE):
        w2o = lrow.col16("s_w2o")
        o2w = lrow.col16("s_o2w")
        pos_local = cm.tp16(w2o, pos)
        lp_l, ln_l, pdf_area_s = _sample_sphere_local_row(
            lrow.col1("s_radius"), lrow.col1("s_zmin"),
            lrow.col1("s_zmax"), lrow.col1("s_thetamin"),
            lrow.col1("s_thetamax"), lrow.col1("s_phimax"), u2)
        lp_l, ln_l = sgv(lp_l), sgv(ln_l)
        wi_l = vsub(lp_l, pos_local)
        d2_l = vlength2(wi_l)
        wi_ln = vscale(wi_l, jax.lax.rsqrt(jnp.maximum(d2_l, 1e-20)))
        denom = jnp.abs(vdot(ln_l, wi_ln))
        inv_den = jnp.where(denom > 1e-20,
                            1.0 / jnp.maximum(denom, 1e-20), 0.0)
        pdf_s = pdf_area_s * d2_l * inv_den
        pdf_s = jnp.where((d2_l < 1e-12) | ~jnp.isfinite(pdf_s), 0.0,
                          pdf_s)
        front_s = vdot(vsub(pos_local, lp_l), ln_l) > 0.0
        pfrom_s = cm.tp16(o2w, lp_l)
        rad_s = vwhere(front_s, emission, zero3)
    else:
        pfrom_s, rad_s, pdf_s = zero3, zero3, zero1

    has_tris = has(sc.L_AREA_TRI) and "tri_v0" in lrow._cidx
    if has_tris:
        bary = sgv(cm.sample_uniform_triangle(u2))
        v0 = lrow.col3("tri_v0")
        v1 = lrow.col3("tri_v1")
        v2 = lrow.col3("tri_v2")
        n0 = lrow.col3("tri_n0")
        n1 = lrow.col3("tri_n1")
        n2 = lrow.col3("tri_n2")
        # twin: triangle.sample_tri
        lp_t = vadd(vadd(vscale(v0, bary[0]), vscale(v1, bary[1])),
                    vscale(v2, bary[2]))
        ln_t = vnormalize(
            vadd(vadd(vscale(n0, bary[0]), vscale(n1, bary[1])),
                 vscale(n2, bary[2])))
        area_t = 0.5 * jnp.sqrt(jnp.maximum(
            vlength2(vcross(vsub(v1, v0), vsub(v2, v0))), 1e-30))
        pdf_area_t = 1.0 / area_t
        wi_t = vsub(lp_t, pos)
        d2_t = vlength2(wi_t)
        wi_tn = vscale(wi_t, jax.lax.rsqrt(jnp.maximum(d2_t, 1e-20)))
        denom_t = jnp.abs(vdot(ln_t, wi_tn))
        inv_den_t = jnp.where(denom_t > 1e-20,
                              1.0 / jnp.maximum(denom_t, 1e-20), 0.0)
        pdf_t = pdf_area_t * d2_t * inv_den_t
        pdf_t = jnp.where((d2_t < 1e-12) | ~jnp.isfinite(pdf_t), 0.0,
                          pdf_t)
        front_t = vdot(vsub(pos, lp_t), ln_t) > 0.0
        rad_t = vwhere(front_t, emission, zero3)
    else:
        lp_t, pdf_t, rad_t = zero3, zero1, zero3

    lpos = lrow.col3("pos")
    if has(sc.L_POINT) or has(sc.L_SPOT):
        wi_p = vsub(lpos, pos)
        d2_p = vlength2(wi_p)
        rad_p = vscale(emission, 1.0 / jnp.maximum(d2_p, 1e-20))
    else:
        rad_p = zero3
    pdf_p = jnp.ones_like(zero1)

    if has(sc.L_SPOT):
        axis = vnormalize(lrow.col3("aux"))
        cos_total = lrow.col1("params")
        cos_falloff = lrow.col1("params", 1)
        wi_pn = vscale(wi_p, jax.lax.rsqrt(jnp.maximum(d2_p, 1e-20)))
        cos_to = vdot(vneg(wi_pn), axis)
        tt = jnp.clip((cos_to - cos_total)
                      / jnp.maximum(cos_falloff - cos_total, 1e-8),
                      0.0, 1.0)
        falloff = jnp.where(cos_to < cos_total, 0.0,
                            jnp.where(cos_to > cos_falloff, 1.0,
                                      (tt * tt) * (tt * tt)))
        rad_sp = vscale(rad_p, falloff)
    else:
        rad_sp = zero3

    if has(sc.L_DISTANT):
        ldir = vnormalize(lpos)
        wr = lrow.col1("params")
        pfrom_d = vsub(pos, vscale(ldir, 2.0 * jnp.maximum(wr, 1e-6)))
        rad_d = emission
    else:
        pfrom_d, rad_d = zero3, zero3
    pdf_d = jnp.ones_like(zero1)

    def pick(sphere_v, tri_v, point_v, spot_v, distant_v, default,
             vec=False):
        w = vwhere if vec else jnp.where
        out = default
        if has(sc.L_AREA_TRI):
            out = w(lt == sc.L_AREA_TRI, tri_v, out)
        if has(sc.L_AREA_SPHERE):
            out = w(lt == sc.L_AREA_SPHERE, sphere_v, out)
        if has(sc.L_POINT):
            out = w(lt == sc.L_POINT, point_v, out)
        if has(sc.L_SPOT):
            out = w(lt == sc.L_SPOT, spot_v, out)
        if has(sc.L_DISTANT):
            out = w(lt == sc.L_DISTANT, distant_v, out)
        return out

    pfrom = pick(pfrom_s, lp_t, lpos, lpos, pfrom_d, zero3, vec=True)
    radiance = pick(rad_s, rad_t, rad_p, rad_sp, rad_d, zero3, vec=True)
    pdf = pick(pdf_s, pdf_t, pdf_p, pdf_p, pdf_d, zero1)
    wi = vnormalize(vsub(pfrom, pos))
    if present is not None and not (
            sc.L_POINT in present or sc.L_SPOT in present):
        delta = jnp.zeros_like(lt, bool)
    else:
        delta = (lt == sc.L_POINT) | (lt == sc.L_SPOT)
    return dict(radiance=radiance, pdf=pdf, pfrom=pfrom, wi=wi,
                delta=delta)


def _refine_p_local(o, d, t, radius):
    """Twin: sphere.refine_p_local."""
    p = vadd(o, vscale(d, t))
    plen = jnp.sqrt(jnp.maximum(vlength2(p), 0.0))
    p = vscale(p, radius / jnp.maximum(plen, 1e-20))
    degenerate = (p[0] == 0.0) & (p[1] == 0.0)
    px = jnp.where(degenerate, 1e-5 * radius, p[0])
    return (px, p[1], p[2])


def _intersect_local_sphere(o, d, tmax, radius, zmin, zmax, phimax,
                            skip_phi_clip: bool = False):
    """Twin: sphere._intersect_local."""
    a = jnp.maximum(vdot(d, d), 1e-20)
    b = 2.0 * vdot(d, o)
    c = vdot(o, o) - radius * radius
    delta = b * b - 4.0 * a * c
    has_root = delta >= 0.0
    sq = jnp.sqrt(jnp.maximum(delta, 1e-30))
    inv2a = 1.0 / (2.0 * a)
    d1 = sq * inv2a
    d0 = -b * inv2a
    t0 = d0 - d1
    t1 = d0 + d1
    t = jnp.where(t0 > 0.0, t0, t1)
    ok = has_root & ~((t0 > tmax) | (t1 < 0.0)) \
        & ~((t0 <= 0.0) & (t1 > tmax))
    p = _refine_p_local(o, d, t, radius)
    clipped = (p[2] < zmin) | (p[2] > zmax)
    if not skip_phi_clip:
        phi = cm.atan2_poly(p[1], p[0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
        clipped = clipped | (phi > phimax)
    return ok & ~clipped, t, p


def light_pdf_wi_rows(lrow: CRow, present, pos, wi,
                      full_phi_spheres: bool = False):
    """Twin: nee.light_pdf_wi_rows."""
    has = lambda t: present is None or t in present
    lt = lrow.col1("ltype").astype(jnp.int32)
    zero1 = jnp.zeros_like(pos[0])
    inf = jnp.full_like(zero1, jnp.inf)

    if has(sc.L_AREA_SPHERE):
        w2o = lrow.col16("s_w2o")
        pos_l = cm.tp16(w2o, pos)
        wi_l = cm.tv16(w2o, wi)
        radius = lrow.col1("s_radius")
        hit_s, t_s, p_l = _intersect_local_sphere(
            pos_l, wi_l, inf, radius, lrow.col1("s_zmin"),
            lrow.col1("s_zmax"), lrow.col1("s_phimax"),
            skip_phi_clip=full_phi_spheres)
        n_l = vscale(p_l, jax.lax.rsqrt(
            jnp.maximum(vlength2(p_l), 1e-20)))
        area_s = (lrow.col1("s_phimax") * radius
                  * (lrow.col1("s_zmax") - lrow.col1("s_zmin")))
        d2_s = vlength2(vsub(p_l, pos_l))
        pdf_s = d2_s / (jnp.maximum(jnp.abs(vdot(wi_l, n_l)), 1e-20)
                        * area_s)
        pdf_s = jnp.where(hit_s & jnp.isfinite(pdf_s), pdf_s, 0.0)
    else:
        pdf_s = zero1

    if has(sc.L_AREA_TRI) and "tri_v0" in lrow._cidx:
        v0 = lrow.col3("tri_v0")
        v1 = lrow.col3("tri_v1")
        v2 = lrow.col3("tri_v2")
        # twin: triangle.intersect_one
        e1 = vsub(v1, v0)
        e2 = vsub(v2, v0)
        pvec = vcross(wi, e2)
        det = vdot(e1, pvec)
        ok = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tvec = vsub(pos, v0)
        u = vdot(tvec, pvec) * inv
        qvec = vcross(tvec, e1)
        v = vdot(wi, qvec) * inv
        t_t = vdot(e2, qvec) * inv
        hit_t = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
            & (t_t > 1e-6)
        t_t = jnp.where(hit_t, t_t, jnp.inf)
        ng = vnormalize(vcross(e1, e2))
        area_t = 0.5 * jnp.sqrt(jnp.maximum(
            vlength2(vcross(e1, e2)), 1e-30))
        d2_t = t_t * t_t
        pdf_t = d2_t / (jnp.maximum(jnp.abs(vdot(wi, ng)), 1e-20)
                        * area_t)
        pdf_t = jnp.where(hit_t & jnp.isfinite(pdf_t), pdf_t, 0.0)
    else:
        pdf_t = zero1

    return jnp.where(lt == sc.L_AREA_SPHERE, pdf_s,
                     jnp.where(lt == sc.L_AREA_TRI, pdf_t, 0.0))


def direct_light_contrib(ls, f_raw, spdf, ns):
    """Twin: nee.direct_light_contrib."""
    wi = ls["wi"]
    no_effect = (ls["pdf"] == 0.0) | cm.is_black(ls["radiance"])
    f = vscale(f_raw, jnp.abs(vdot(wi, ns)))
    f = vwhere(spdf == 0.0, vzero_like(spdf), f)
    need_shadow = ~no_effect & ~cm.is_black(f)
    inv_lpdf = jnp.where(ls["pdf"] > 1e-18,
                         1.0 / jnp.maximum(ls["pdf"], 1e-18), 0.0)
    w_mis = cm.power_heuristic(1, ls["pdf"], 1, spdf)
    contrib_delta = vscale(cm.vmul(ls["radiance"], f), inv_lpdf)
    contrib_area = vscale(contrib_delta, w_mis)
    contrib = vwhere(ls["delta"], contrib_delta, contrib_area)
    contrib = vwhere(need_shadow & ~no_effect, contrib,
                     vzero_like(spdf))
    return cm.sanitize(contrib), need_shadow


def path_mis_weight_rows(lrow: CRow, present, selpdf, pos, wi2, pdf2,
                         kind2, f2, full_phi_spheres: bool = False):
    """Twin: nee.path_mis_weight_rows."""
    lt = lrow.col1("ltype").astype(jnp.int32)
    is_spec = (kind2 & SPECULAR) != 0
    lpdf = light_pdf_wi_rows(lrow, present, pos, wi2,
                             full_phi_spheres=full_phi_spheres)
    if present is not None and not (
            sc.L_POINT in present or sc.L_SPOT in present):
        delta = jnp.zeros_like(lt, bool)
    else:
        delta = (lt == sc.L_POINT) | (lt == sc.L_SPOT)
    active = (~delta & ~cm.is_black(f2) & (pdf2 > 0.0)
              & (is_spec | (lpdf > 0.0)))
    w2 = jnp.where(is_spec, 1.0,
                   cm.power_heuristic(1, pdf2, 1, lpdf))
    return jnp.where(active, w2 / jnp.maximum(selpdf, 1e-20), 0.0)


# ---------------------------------------------------------------------------
# material recipe twin (materials.build_slots)
# ---------------------------------------------------------------------------

def build_slots(mtype, kd, ks, sigma, rough, eta, dissolve,
                ns, ng, dpdu, presence=None, dist_sets=None):
    """Twin: materials.build_slots (component form; K = MAX_SLOTS)."""
    K = mats.MAX_SLOTS
    alpha = cm.roughness_to_alpha(rough)
    sigma_c = jnp.clip(sigma, 0.0, 90.0)
    kd_black = cm.is_black(kd)
    ks_black = cm.is_black(ks)

    zi = jnp.zeros_like(mtype)
    zf = jnp.zeros_like(sigma)
    z3 = (zf, zf, zf)
    ktype = [zi for _ in range(K)]
    kc0 = [z3 for _ in range(K)]
    kc1 = [z3 for _ in range(K)]
    kp0 = [zf for _ in range(K)]
    kp1 = [zf for _ in range(K)]
    kp2 = [zf for _ in range(K)]
    kdist = [zi for _ in range(K)]

    def put(slot, mask, stype, c0=None, c1=None, p0=None, p1=None,
            p2=None, dist=None):
        ktype[slot] = jnp.where(mask, stype, ktype[slot])
        if c0 is not None:
            kc0[slot] = vwhere(mask, c0, kc0[slot])
        if c1 is not None:
            kc1[slot] = vwhere(mask, c1, kc1[slot])
        if p0 is not None:
            kp0[slot] = jnp.where(mask, p0, kp0[slot])
        if p1 is not None:
            kp1[slot] = jnp.where(mask, p1, kp1[slot])
        if p2 is not None:
            kp2[slot] = jnp.where(mask, p2, kp2[slot])
        if dist is not None:
            kdist[slot] = jnp.where(mask, dist, kdist[slot])

    one = jnp.ones_like(zf)
    clip3 = lambda c: (jnp.clip(c[0], 0.0, 1.0),
                       jnp.clip(c[1], 0.0, 1.0),
                       jnp.clip(c[2], 0.0, 1.0))

    matte = mtype == mats.M_MATTE
    s2 = sigma_c * sigma_c
    on_a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    on_b = 0.45 * s2 / (s2 + 0.09)
    m_lam = matte & ~kd_black & (sigma_c == 0.0)
    m_on = matte & ~kd_black & (sigma_c != 0.0)
    put(0, m_lam, T_LAMBERT_R, c0=kd)
    put(0, m_on, T_OREN_NAYAR, c0=kd, p0=on_a, p1=on_b)

    plastic = mtype == mats.M_PLASTIC
    put(0, plastic, T_ASHIKHMIN, c0=clip3(kd), c1=clip3(ks),
        p0=alpha,
        dist=zi + mats.RECIPE_DISTS[mats.M_PLASTIC][T_ASHIKHMIN])

    glass = mtype == mats.M_GLASS
    g_spec = glass & ~ks_black
    g_diff = glass & ~kd_black
    tr = zi + mats.RECIPE_DISTS[mats.M_GLASS][T_TS_R]
    put(0, g_spec, T_FRESNEL_SPEC, c0=ks, c1=ks, p0=one, p1=eta)
    put(0, g_diff & ~g_spec, T_TS_R, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)
    put(1, g_diff & g_spec, T_TS_R, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)
    put(1, g_diff & ~g_spec, T_TS_T, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)
    put(2, g_diff & g_spec, T_TS_T, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)

    transl = mtype == mats.M_TRANSLUCENT
    t_as = transl & (dissolve != 0.0)
    t_lt = transl & ~kd_black
    put(0, t_as, T_ASHIKHMIN,
        c0=clip3(vscale(kd, dissolve)), c1=clip3(vscale(ks, dissolve)),
        p0=alpha,
        dist=zi + mats.RECIPE_DISTS[mats.M_TRANSLUCENT][T_ASHIKHMIN])
    put(0, t_lt & ~t_as, T_LAMBERT_T, c0=vscale(kd, 1.0 - dissolve))
    put(1, t_lt & t_as, T_LAMBERT_T, c0=vscale(kd, 1.0 - dissolve))

    kinds = []
    for k in range(K):
        kind = jnp.zeros_like(ktype[k])
        for t in range(1, len(KIND_OF_TYPE)):
            if KIND_OF_TYPE[t]:
                kind = jnp.where(ktype[k] == t, KIND_OF_TYPE[t], kind)
        kinds.append(kind)

    ts, bs = cm.make_bsdf_frame(ns, ng, dpdu)
    bsdf_eta = jnp.where(glass, eta, 1.0)
    return cm.CSlots(ns=ns, ts=ts, bs=bs, ng=ng, eta=bsdf_eta,
                     type=ktype, kind=kinds, c0=kc0, c1=kc1,
                     p0=kp0, p1=kp1, p2=kp2, dist=kdist,
                     present=presence, dists=dist_sets)


# ---------------------------------------------------------------------------
# the bounce body (twin: pallas_bounce._body)
# ---------------------------------------------------------------------------

def _hit_info(col, st_at, n_s, tcol_base: int = 13):
    """Hit shading-info construction (the first half of the bounce):
    returns (pos, pos_err, ng, ns, dpdu, dpdv, uv, mat_id, light_id,
    b0, b1).  col layout: o 0:3, d 3:6, hit @pb._HIT, is_sph, s_idx,
    p_local 10:13, trow at tcol_base."""
    o_ray = (col(0), col(1), col(2))
    d = (col(3), col(4), col(5))
    hitmask = col(pb._HIT) > 0.5
    is_sph = col(pb._IS_SPH) > 0.5
    s_idx = col(pb._S_IDX).astype(jnp.int32)
    p_local = (col(10), col(11), col(12))
    tcol = lambda j: col(tcol_base + j)

    srow = CRow(st_at, n_s, s_idx)
    b0, b1 = bary_from_vertices(o_ray, d, (tcol(0), tcol(1), tcol(2)),
                                (tcol(3), tcol(4), tcol(5)),
                                (tcol(6), tcol(7), tcol(8)))
    pos_t, perr_t, dpdu_t, dpdv_t, ns_raw = tri_shading_from_row(
        tcol, b0, b1)
    ng_t = vnormalize(vcross(dpdu_t, dpdv_t))
    flip = vdot(ns_raw, ng_t) < 0.0
    ns_t = vwhere(flip, vneg(ns_raw), ns_raw)
    pos_s, ng_s, dpdu_s, dpdv_s, perr_s = sphere_shading_from_row(
        srow, p_local)
    pos = vwhere(is_sph, pos_s, pos_t)
    pos_err = vwhere(is_sph, perr_s, perr_t)
    ng = vwhere(is_sph, ng_s, ng_t)
    ns = vwhere(is_sph, ng_s, ns_t)
    dpdu = vwhere(is_sph, dpdu_s, dpdu_t)
    dpdv = vwhere(is_sph, dpdv_s, dpdv_t)
    # uv: triangle barycentric interp / sphere (phi, theta) chart
    b2 = 1.0 - b0 - b1
    uv_t = (b0 * tcol(18) + b1 * tcol(20) + b2 * tcol(22),
            b0 * tcol(19) + b1 * tcol(21) + b2 * tcol(23))
    uv_s = _sphere_uv(srow, p_local)
    uv = (jnp.where(is_sph, uv_s[0], uv_t[0]),
          jnp.where(is_sph, uv_s[1], uv_t[1]))
    mat_id = jnp.where(is_sph, srow.col_abs(20),
                       tcol(24)).astype(jnp.int32)
    light_id = jnp.where(is_sph, srow.col_abs(21),
                         tcol(25)).astype(jnp.int32)
    light_id = jnp.where(hitmask, light_id, -1)
    return (pos, pos_err, ng, ns, dpdu, dpdv, uv, mat_id, light_id,
            hitmask)


def _sphere_uv(srow: CRow, p):
    """uv at a local sphere point (twin: sphere._local_duv's uv part;
    acos_poly in place of arccos — Mosaic has no lowering; ~7e-5 rad,
    sub-texel at any practical resolution)."""
    radius = srow.col_abs(16)
    thetamin = srow.col_abs(17)
    thetamax = srow.col_abs(18)
    phimax = srow.col_abs(19)
    phi = cm.atan2_poly(p[1], p[0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
    u = phi / jnp.maximum(phimax, 1e-8)
    theta = cm.acos_poly(jnp.clip(
        p[2] / jnp.maximum(radius, 1e-20), -1.0 + 1e-7, 1.0 - 1e-7))
    v = (theta - thetamin) / jnp.where(
        jnp.abs(thetamax - thetamin) < 1e-8, 1.0, thetamax - thetamin)
    return (u, v)


def _shade_core(d, pos, pos_err, ng, ns, dpdu, mtype, kd, ks, sigma,
                rough, eta, dissolve, light_id, hitmask, beta, L,
                specular, sel_prev, wb_prev, nee_prev, alive, lidx,
                selpdf, u_light, u_bsdf, u_rr, bounce, lt_at, n_l, *,
                presence, dist_sets, lcidx, lpresent, emi_cols,
                min_depth, rr_threshold, full_phi):
    """The bounce shade proper (steps (2)-(5)), over already-resolved
    hit info + material parameters.  Returns the OUT_COLS columns."""
    cidx = dict(lcidx)
    lane_active = alive & hitmask

    # (2) emitted radiance
    lerow = CRow(lt_at, n_l, jnp.maximum(light_id, 0), cidx)
    le = (lerow.col_abs(emi_cols[0]),
          lerow.col_abs(emi_cols[0] + 1),
          lerow.col_abs(emi_cols[0] + 2))
    emit_gate = lane_active & (light_id >= 0)
    w_emit = jnp.where((bounce == 0.0) | specular, 1.0, 0.0) \
        + jnp.where(nee_prev & (light_id == sel_prev), wb_prev, 0.0)
    zero3 = vzero_like(w_emit)
    L = vadd(L, vwhere(emit_gate,
                       vscale(cm.vmul(beta, le), w_emit), zero3))

    # (3) scattering + NEE
    wo = vneg(d)
    bsdf = build_slots(mtype, kd, ks, sigma, rough, eta, dissolve,
                       ns, ng, dpdu, presence=presence,
                       dist_sets=dist_sets)
    do_nee = lane_active & (cm.match_count(bsdf, ALL_NON_SPECULAR) > 0)
    lrow = CRow(lt_at, n_l, jnp.maximum(lidx, 0), cidx)
    ls = light_sample_rows(lrow, lpresent, pos, u_light,
                           full_phi_spheres=full_phi)
    f_raw, spdf = cm.bsdf_eval_pdf(bsdf, wo, ls["wi"], ALL)
    contrib, need_shadow = direct_light_contrib(ls, f_raw, spdf,
                                                bsdf.ns)
    inv_sel = 1.0 / jnp.maximum(selpdf, 1e-20)
    contrib_out = vwhere(do_nee, vscale(cm.vmul(beta, contrib),
                                        inv_sel), zero3)
    need_sh_out = need_shadow & do_nee
    d_sh = vsub(ls["pfrom"], pos)
    o_sh = offset_ray_origin(pos, pos_err, ng, d_sh)
    seg = vsub(ls["pfrom"], o_sh)
    dist_sh = jnp.sqrt(jnp.maximum(vlength2(seg), 1e-20))
    dirn = vscale(seg, 1.0 / dist_sh)
    sh_t = dist_sh * (1.0 - 1e-3)

    # (4) bsdf sample for path continuation
    f, wi, pdf, kind = cm.bsdf_sample(bsdf, wo, u_bsdf, ALL)
    cont = lane_active & ~cm.is_black(f) & (pdf > 0.0)
    spec_new = (kind & SPECULAR) != 0
    specular = (lane_active & spec_new) | (~lane_active & specular)
    wb = path_mis_weight_rows(lrow, lpresent, selpdf, pos, wi, pdf,
                              kind, f, full_phi_spheres=full_phi)
    sel_prev = jnp.where(lane_active, lidx, sel_prev)
    wb_prev = jnp.where(lane_active, wb, wb_prev)
    nee_prev = do_nee
    ratio = jnp.abs(vdot(wi, bsdf.ns)) / jnp.maximum(pdf, 1e-20)
    overflow = ratio > 1e12
    cont = cont & ~overflow
    ratio = jnp.where(cont, jnp.minimum(ratio, 1e12), 0.0)
    new_beta = vscale(cm.vmul(beta, f), ratio)
    beta_ok = cm.valid(new_beta)
    beta = vwhere(cont & beta_ok, new_beta, beta)
    alive = lane_active & cont & beta_ok

    o = offset_ray_origin(pos, pos_err, ng, wi)
    degenerate = vlength2(wi) < 1e-12
    zero = jnp.zeros_like(wi[0])
    fallback = (zero, zero, jnp.ones_like(zero))
    d_out = vwhere(degenerate, fallback, wi)
    alive = alive & ~degenerate

    # (5) russian roulette
    lum = cm.luminance(beta)
    q = max(rr_threshold, 0.05)
    rr_active = (bounce + 1.0) >= float(min_depth)
    roulette = rr_active & (lum < rr_threshold)
    killed = roulette & (u_rr < q)
    beta = vwhere(roulette & ~killed, vscale(beta, 1.0 / (1.0 - q)),
                  beta)
    alive = alive & ~killed

    b1_ = lambda m: jnp.where(m, 1.0, 0.0)
    out = [
        o[0], o[1], o[2], d_out[0], d_out[1], d_out[2],
        L[0], L[1], L[2], beta[0], beta[1], beta[2],
        b1_(alive), b1_(specular), sel_prev.astype(jnp.float32),
        wb_prev, b1_(nee_prev),
        o_sh[0], o_sh[1], o_sh[2], dirn[0], dirn[1], dirn[2],
        sh_t, b1_(need_sh_out),
        contrib_out[0], contrib_out[1], contrib_out[2],
    ]
    out += [zero] * (OUT_COLS - len(out))
    return out


def cbody(col, lt_at, mt_at, st_at, n_l, n_m, n_s, *, presence,
          dist_sets, lcidx, lpresent, emi_cols, min_depth,
          rr_threshold, full_phi):
    """Component-form bounce shade (single-kernel, untextured path).

    col(i): the i-th input column (pallas_bounce layout) as a
    lane-shaped array; lt_at/mt_at/st_at(r, c): table elements;
    n_l/n_m/n_s: static table row counts.  Returns the OUT_COLS
    output columns as a list (same layout as pallas_bounce)."""
    d = (col(3), col(4), col(5))
    (pos, pos_err, ng, ns, dpdu, _dpdv, _uv, mat_id, light_id,
     hitmask) = _hit_info(col, st_at, n_s)

    mrow = CRow(mt_at, n_m, jnp.maximum(mat_id, 0))
    mtype = mrow.col_abs(0).astype(jnp.int32)
    kd = (mrow.col_abs(1), mrow.col_abs(2), mrow.col_abs(3))
    ks = (mrow.col_abs(4), mrow.col_abs(5), mrow.col_abs(6))
    sigma = mrow.col_abs(7)
    rough = mrow.col_abs(8)
    eta = mrow.col_abs(9)
    dissolve = mrow.col_abs(10)

    return _shade_core(
        d, pos, pos_err, ng, ns, dpdu, mtype, kd, ks, sigma, rough,
        eta, dissolve, light_id, hitmask,
        (col(39), col(40), col(41)), (col(42), col(43), col(44)),
        col(pb._SPECULAR) > 0.5, col(pb._SEL_PREV).astype(jnp.int32),
        col(pb._WB_PREV), col(pb._NEE_PREV) > 0.5,
        col(pb._ALIVE) > 0.5, col(pb._LIDX).astype(jnp.int32),
        col(pb._SELPDF), (col(52), col(53)), (col(54), col(55)),
        col(pb._U_RR), col(pb._BOUNCE), lt_at, n_l,
        presence=presence, dist_sets=dist_sets, lcidx=lcidx,
        lpresent=lpresent, emi_cols=emi_cols, min_depth=min_depth,
        rr_threshold=rr_threshold, full_phi=full_phi)


# ---------------------------------------------------------------------------
# hybrid-split bodies for the TEXTURED fast path (VERDICT r4 item 3):
# kernel A resolves hit info + uv + ray-cone LOD, XLA fetches texels
# (HBM gathers stay outside Pallas), kernel B runs the shade proper on
# resolved material parameters.
# ---------------------------------------------------------------------------

# kernel-A input layout: cols 0:39 match the single-kernel layout
# (o d t hit is_sph s_idx p_local trow) + cone_w + spread
H_CONE_W = 39
H_SPREAD = 40
HIT_IN_COLS = 41
# kernel-A output layout
HIT_OUT_COLS = 28   # pos 0:3 perr 3:6 ng 6:9 ns 9:12 dpdu 12:15
                    # dpdv 15:18 uv 18:20 duvdx 20:22 duvdy 22:24
                    # mat_id 24 light_id 25 cone_w 26 (pad 27)


def _solve_duv_c(nrm, dpdu, dpdv, dp):
    """Component twin of dxy._solve_duv (argmax|n| axis dropped via
    comparison masks instead of fancy indexing)."""
    anx, any_, anz = jnp.abs(nrm[0]), jnp.abs(nrm[1]), jnp.abs(nrm[2])
    amax0 = (anx >= any_) & (anx >= anz)
    amax2 = ~amax0 & (anz > any_)
    # a0 = 1 if amax==0 else 0;  a1 = 1 if amax==2 else 2
    pick_a0 = lambda v: jnp.where(amax0, v[1], v[0])
    pick_a1 = lambda v: jnp.where(amax2, v[1], v[2])
    A00 = pick_a0(dpdu)
    A01 = pick_a0(dpdv)
    A10 = pick_a1(dpdu)
    A11 = pick_a1(dpdv)
    b0 = pick_a0(dp)
    b1 = pick_a1(dp)
    det = A00 * A11 - A01 * A10
    ok = jnp.abs(det) > 1e-20
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    du = (A11 * b0 - A01 * b1) * inv
    dv = (A00 * b1 - A10 * b0) * inv
    return du, dv


def _cone_duv_c(r, d, ng, dpdu, dpdv):
    """Component twin of dxy.cone_duv."""
    cos_i = vdot(d, ng)
    proj = vsub(d, vscale(ng, cos_i))
    p2 = vlength2(proj)
    rs = jax.lax.rsqrt(jnp.maximum(p2, 1e-30))
    nd = vnormalize(dpdu)
    e1 = vwhere(p2 > 1e-12, vscale(proj, rs), nd)
    e2 = vcross(ng, e1)
    a1 = vscale(e1, r / jnp.maximum(jnp.abs(cos_i), 0.1))
    a2 = vscale(e2, r)
    dudx, dvdx = _solve_duv_c(ng, dpdu, dpdv, a1)
    dudy, dvdy = _solve_duv_c(ng, dpdu, dpdv, a2)
    return (dudx, dvdx), (dudy, dvdy)


def cbody_hit(col, st_at, n_s):
    """Kernel A: hit info + uv + ray-cone texture footprint.
    Returns HIT_OUT_COLS columns."""
    d = (col(3), col(4), col(5))
    t = col(pb._T)
    (pos, pos_err, ng, ns, dpdu, dpdv, uv, mat_id, light_id,
     hitmask) = _hit_info(col, st_at, n_s)
    cone_w = col(H_CONE_W)
    spread = col(H_SPREAD)
    # ray-cone footprint at the hit (twin: integrator's cone handling
    # + dxy.cone_duv; pt.rs:142 scale_differentials analogue upstream)
    ft = jnp.where(hitmask, t, 0.0)
    r_cone = cone_w + spread * ft
    (dudx, dvdx), (dudy, dvdy) = _cone_duv_c(r_cone, d, ng, dpdu, dpdv)
    cone_out = jnp.where(hitmask, r_cone, cone_w)
    zero = jnp.zeros_like(t)
    return [
        pos[0], pos[1], pos[2], pos_err[0], pos_err[1], pos_err[2],
        ng[0], ng[1], ng[2], ns[0], ns[1], ns[2],
        dpdu[0], dpdu[1], dpdu[2], dpdv[0], dpdv[1], dpdv[2],
        uv[0], uv[1], dudx, dvdx, dudy, dvdy,
        mat_id.astype(jnp.float32), light_id.astype(jnp.float32),
        cone_out, zero,
    ]


# kernel-B input layout
S_D = slice(0, 3)
S_POS = slice(3, 6)
S_PERR = slice(6, 9)
S_NG = slice(9, 12)
S_NS = slice(12, 15)
S_DPDU = slice(15, 18)
S_MTYPE = 18
S_KD = slice(19, 22)
S_KS = slice(22, 25)
S_SIGMA = 25
S_ROUGH = 26
S_ETA = 27
S_DISSOLVE = 28
S_LIGHT_ID = 29
S_HIT = 30
S_BETA = slice(31, 34)
S_L = slice(34, 37)
S_SPECULAR = 37
S_SEL_PREV = 38
S_WB_PREV = 39
S_NEE_PREV = 40
S_ALIVE = 41
S_LIDX = 42
S_SELPDF = 43
S_U_LIGHT = slice(44, 46)
S_U_BSDF = slice(46, 48)
S_U_RR = 48
S_BOUNCE = 49
SHADE_IN_COLS = 50


def cbody_shade(col, lt_at, n_l, *, presence, dist_sets, lcidx,
                lpresent, emi_cols, min_depth, rr_threshold,
                full_phi):
    """Kernel B: the shade proper over texture-resolved materials."""
    c3 = lambda s: (col(s.start), col(s.start + 1), col(s.start + 2))
    return _shade_core(
        c3(S_D), c3(S_POS), c3(S_PERR), c3(S_NG), c3(S_NS),
        c3(S_DPDU), col(S_MTYPE).astype(jnp.int32), c3(S_KD),
        c3(S_KS), col(S_SIGMA), col(S_ROUGH), col(S_ETA),
        col(S_DISSOLVE), col(S_LIGHT_ID).astype(jnp.int32),
        col(S_HIT) > 0.5, c3(S_BETA), c3(S_L), col(S_SPECULAR) > 0.5,
        col(S_SEL_PREV).astype(jnp.int32), col(S_WB_PREV),
        col(S_NEE_PREV) > 0.5, col(S_ALIVE) > 0.5,
        col(S_LIDX).astype(jnp.int32), col(S_SELPDF),
        (col(S_U_LIGHT.start), col(S_U_LIGHT.start + 1)),
        (col(S_U_BSDF.start), col(S_U_BSDF.start + 1)),
        col(S_U_RR), col(S_BOUNCE), lt_at, n_l,
        presence=presence, dist_sets=dist_sets, lcidx=lcidx,
        lpresent=lpresent, emi_cols=emi_cols, min_depth=min_depth,
        rr_threshold=rr_threshold, full_phi=full_phi)


# ---------------------------------------------------------------------------
# pallas wrapper
# ---------------------------------------------------------------------------

def _kernel(x_ref, lt_ref, mt_ref, st_ref, o_ref, **cfg):
    col = lambda i: x_ref[i]
    lt_at = lambda r, c: lt_ref[r, c]
    mt_at = lambda r, c: mt_ref[r, c]
    st_at = lambda r, c: st_ref[r, c]
    outs = cbody(col, lt_at, mt_at, st_at, lt_ref.shape[0],
                 mt_ref.shape[0], st_ref.shape[0], **cfg)
    for j in range(OUT_COLS):
        o_ref[j] = outs[j]


@functools.partial(
    jax.jit, static_argnames=("presence", "dist_sets", "lcidx",
                              "lpresent", "emi_cols", "min_depth",
                              "rr_threshold", "full_phi", "interpret"))
def _run(xt, ltab, mtab, stab, presence, dist_sets, lcidx, lpresent,
         emi_cols, min_depth, rr_threshold, full_phi, interpret):
    """xt: [IN_COLS, N] transposed wave.  Returns [OUT_COLS, N]."""
    n = xt.shape[1]
    pad = (-n) % _RN
    if pad:
        xt = jnp.concatenate(
            [xt, jnp.zeros((xt.shape[0], pad), xt.dtype)], 1)
    np_ = xt.shape[1]
    x3 = xt.reshape(IN_COLS, np_ // _LANE, _LANE)
    rn_sub = _RN // _LANE
    kern = functools.partial(
        _kernel, presence=presence, dist_sets=dist_sets, lcidx=lcidx,
        lpresent=lpresent, emi_cols=emi_cols, min_depth=min_depth,
        rr_threshold=rr_threshold, full_phi=full_phi)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    out3 = pl.pallas_call(
        kern,
        grid=(np_ // _RN,),
        in_specs=[
            pl.BlockSpec((IN_COLS, rn_sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            smem(ltab.shape), smem(mtab.shape), smem(stab.shape),
        ],
        out_specs=pl.BlockSpec((OUT_COLS, rn_sub, _LANE),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (OUT_COLS, np_ // _LANE, _LANE), jnp.float32),
        interpret=interpret,
    )(x3, ltab, mtab, stab)
    return out3.reshape(OUT_COLS, np_)[:, :n]


def xla_reference(xt, ltab, mtab, stab, presence, dist_sets, lcidx,
                  lpresent, emi_cols, min_depth, rr_threshold,
                  full_phi):
    """The same component body as plain XLA over [N]-shaped columns —
    the fuzz-parity oracle hook and the backward-pass twin."""
    col = lambda i: xt[i]
    lt_at = lambda r, c: ltab[r, c]
    mt_at = lambda r, c: mtab[r, c]
    st_at = lambda r, c: stab[r, c]
    outs = cbody(col, lt_at, mt_at, st_at, ltab.shape[0],
                 mtab.shape[0], stab.shape[0], presence=presence,
                 dist_sets=dist_sets, lcidx=lcidx, lpresent=lpresent,
                 emi_cols=emi_cols, min_depth=min_depth,
                 rr_threshold=rr_threshold, full_phi=full_phi)
    return jnp.stack(outs, axis=0)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def bounce_shade_t(xt, ltab, mtab, stab, presence, dist_sets, lcidx,
                   lpresent, emi_cols, min_depth, rr_threshold,
                   full_phi, interpret=False):
    """Kernelized component-form bounce shade over the transposed
    wave xt [IN_COLS, N].  Returns [OUT_COLS, N]."""
    return _run(xt, ltab, mtab, stab, presence, dist_sets, lcidx,
                lpresent, emi_cols, min_depth, rr_threshold, full_phi,
                interpret)


def _fwd(xt, ltab, mtab, stab, presence, dist_sets, lcidx, lpresent,
         emi_cols, min_depth, rr_threshold, full_phi, interpret):
    out = bounce_shade_t(xt, ltab, mtab, stab, presence, dist_sets,
                         lcidx, lpresent, emi_cols, min_depth,
                         rr_threshold, full_phi, interpret)
    return out, (xt, ltab, mtab, stab)


def backward_kernel_enabled() -> bool:
    """ARENDUR_CBWD=0 falls back to the XLA vjp replay (the r4
    behavior — the fwd+bwd metric pays the full pre-kernel op count)."""
    return os.environ.get("ARENDUR_CBWD", "1") == "1"


_RN_BWD = 1024  # (8,128) fields; Mosaic requires 8-sublane blocks


def _bwd_kernel(x_ref, lt_ref, mt_ref, st_ref, ct_ref,
                dx_ref, dlt_ref, dmt_ref, dst_ref, **cfg):
    """One-launch backward: recompute the forward in-kernel (cheap —
    kernel bodies are ~free on this device, DESIGN §9.4) and apply the
    cotangent via jax.vjp INSIDE the kernel.  Table cotangents are
    per-block scalar sums accumulated across the sequential TPU grid."""
    x3 = x_ref[...]
    lt = lt_ref[...]
    mt = mt_ref[...]
    st = st_ref[...]

    def fwd_fn(x3_, lt_, mt_, st_):
        col = lambda i: x3_[i]
        outs = cbody(col, lambda r, c: lt_[r, c], lambda r, c: mt_[r, c],
                     lambda r, c: st_[r, c], lt_.shape[0], mt_.shape[0],
                     st_.shape[0], **cfg)
        return tuple(outs)

    _, vjp = jax.vjp(fwd_fn, x3, lt, mt, st)
    ct = tuple(ct_ref[j] for j in range(OUT_COLS))
    dx3, dlt, dmt, dst = vjp(ct)
    dx_ref[...] = dx3

    @pl.when(pl.program_id(0) == 0)
    def _():
        dlt_ref[...] = jnp.zeros_like(dlt)
        dmt_ref[...] = jnp.zeros_like(dmt)
        dst_ref[...] = jnp.zeros_like(dst)

    dlt_ref[...] += dlt
    dmt_ref[...] += dmt
    dst_ref[...] += dst


@functools.partial(
    jax.jit, static_argnames=("presence", "dist_sets", "lcidx",
                              "lpresent", "emi_cols", "min_depth",
                              "rr_threshold", "full_phi", "interpret"))
def _run_bwd(xt, ltab, mtab, stab, ct, presence, dist_sets, lcidx,
             lpresent, emi_cols, min_depth, rr_threshold, full_phi,
             interpret):
    n = xt.shape[1]
    pad = (-n) % _RN_BWD
    if pad:
        xt = jnp.concatenate(
            [xt, jnp.zeros((xt.shape[0], pad), xt.dtype)], 1)
        ct = jnp.concatenate(
            [ct, jnp.zeros((ct.shape[0], pad), ct.dtype)], 1)
    np_ = xt.shape[1]
    x3 = xt.reshape(IN_COLS, np_ // _LANE, _LANE)
    c3 = ct.reshape(OUT_COLS, np_ // _LANE, _LANE)
    rn_sub = _RN_BWD // _LANE
    kern = functools.partial(
        _bwd_kernel, presence=presence, dist_sets=dist_sets,
        lcidx=lcidx, lpresent=lpresent, emi_cols=emi_cols,
        min_depth=min_depth, rr_threshold=rr_threshold,
        full_phi=full_phi)
    vmem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    dx3, dlt, dmt, dst = pl.pallas_call(
        kern,
        grid=(np_ // _RN_BWD,),
        in_specs=[
            pl.BlockSpec((IN_COLS, rn_sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            vmem(ltab.shape), vmem(mtab.shape), vmem(stab.shape),
            pl.BlockSpec((OUT_COLS, rn_sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((IN_COLS, rn_sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            acc(ltab.shape), acc(mtab.shape), acc(stab.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((IN_COLS, np_ // _LANE, _LANE),
                                 jnp.float32),
            jax.ShapeDtypeStruct(ltab.shape, jnp.float32),
            jax.ShapeDtypeStruct(mtab.shape, jnp.float32),
            jax.ShapeDtypeStruct(stab.shape, jnp.float32),
        ),
        interpret=interpret,
    )(x3, ltab, mtab, stab, c3)
    return dx3.reshape(IN_COLS, np_)[:, :n], dlt, dmt, dst


def _bwd(presence, dist_sets, lcidx, lpresent, emi_cols, min_depth,
         rr_threshold, full_phi, interpret, res, ct):
    xt, ltab, mtab, stab = res
    if backward_kernel_enabled():
        return _run_bwd(xt, ltab, mtab, stab, ct, presence, dist_sets,
                        lcidx, lpresent, emi_cols, min_depth,
                        rr_threshold, full_phi, interpret)
    _, vjp = jax.vjp(
        lambda x_, lt_, mt_, st_: xla_reference(
            x_, lt_, mt_, st_, presence, dist_sets, lcidx, lpresent,
            emi_cols, min_depth, rr_threshold, full_phi),
        xt, ltab, mtab, stab)
    return vjp(ct)


bounce_shade_t.defvjp(_fwd, _bwd)


def eligible(scene, n_lights_cols=None) -> bool:
    """Host-static: the SMEM row-select scales O(rows); big tables
    stay on the one-hot-matmul kernel (pallas_bounce)."""
    import numpy as np
    if not enabled():
        return False
    try:
        n_m = int(np.asarray(scene.materials.mtype).shape[0])
        n_s = int(np.asarray(scene.spheres.radius).shape[0])
        n_l = int(np.asarray(scene.lights.ltype).shape[0])
    except Exception:
        return False
    return max(n_m, n_s, n_l) <= _MAX_TABLE_ROWS


def unpack_out_t(out):
    """[OUT_COLS, N] kernel output -> dict (same semantics as
    pallas_bounce.unpack_out)."""
    v3 = lambda j: jnp.stack([out[j], out[j + 1], out[j + 2]], -1)
    return dict(
        o=v3(0), d=v3(3), L=v3(6), beta=v3(9),
        alive=out[12] > 0.5, specular=out[13] > 0.5,
        sel_prev=out[14].astype(jnp.int32), wb_prev=out[15],
        nee_prev=out[16] > 0.5,
        sh_o=v3(17), sh_d=v3(20), sh_t=out[23],
        need_shadow=out[24] > 0.5, contrib=v3(25))


# ---------------------------------------------------------------------------
# split-path wrappers (textured scenes)
# ---------------------------------------------------------------------------

def _kernel_hit(x_ref, st_ref, o_ref):
    col = lambda i: x_ref[i]
    outs = cbody_hit(col, lambda r, c: st_ref[r, c], st_ref.shape[0])
    for j in range(HIT_OUT_COLS):
        o_ref[j] = outs[j]


@functools.partial(jax.jit, static_argnames=("interpret",))
def hit_shade_t(xt, stab, interpret=False):
    """Kernel A over the transposed hit input [HIT_IN_COLS, N] ->
    [HIT_OUT_COLS, N].  Geometry only — callers stop_gradient the
    result (detached geometry, DESIGN §5), so no vjp is defined."""
    n = xt.shape[1]
    pad = (-n) % _RN
    if pad:
        xt = jnp.concatenate(
            [xt, jnp.zeros((xt.shape[0], pad), xt.dtype)], 1)
    np_ = xt.shape[1]
    x3 = xt.reshape(HIT_IN_COLS, np_ // _LANE, _LANE)
    rn_sub = _RN // _LANE
    out3 = pl.pallas_call(
        _kernel_hit,
        grid=(np_ // _RN,),
        in_specs=[
            pl.BlockSpec((HIT_IN_COLS, rn_sub, _LANE),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(stab.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((HIT_OUT_COLS, rn_sub, _LANE),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (HIT_OUT_COLS, np_ // _LANE, _LANE), jnp.float32),
        interpret=interpret,
    )(x3, stab)
    return out3.reshape(HIT_OUT_COLS, np_)[:, :n]


def xla_reference_hit(xt, stab):
    """cbody_hit as plain XLA (parity oracle)."""
    outs = cbody_hit(lambda i: xt[i], lambda r, c: stab[r, c],
                     stab.shape[0])
    return jnp.stack(outs, axis=0)


def _kernel_shade(x_ref, lt_ref, o_ref, **cfg):
    col = lambda i: x_ref[i]
    outs = cbody_shade(col, lambda r, c: lt_ref[r, c],
                       lt_ref.shape[0], **cfg)
    for j in range(OUT_COLS):
        o_ref[j] = outs[j]


@functools.partial(
    jax.jit, static_argnames=("presence", "dist_sets", "lcidx",
                              "lpresent", "emi_cols", "min_depth",
                              "rr_threshold", "full_phi", "interpret"))
def _run_shade(xt, ltab, presence, dist_sets, lcidx, lpresent,
               emi_cols, min_depth, rr_threshold, full_phi, interpret):
    n = xt.shape[1]
    pad = (-n) % _RN
    if pad:
        xt = jnp.concatenate(
            [xt, jnp.zeros((xt.shape[0], pad), xt.dtype)], 1)
    np_ = xt.shape[1]
    x3 = xt.reshape(SHADE_IN_COLS, np_ // _LANE, _LANE)
    rn_sub = _RN // _LANE
    kern = functools.partial(
        _kernel_shade, presence=presence, dist_sets=dist_sets,
        lcidx=lcidx, lpresent=lpresent, emi_cols=emi_cols,
        min_depth=min_depth, rr_threshold=rr_threshold,
        full_phi=full_phi)
    out3 = pl.pallas_call(
        kern,
        grid=(np_ // _RN,),
        in_specs=[
            pl.BlockSpec((SHADE_IN_COLS, rn_sub, _LANE),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ltab.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((OUT_COLS, rn_sub, _LANE),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (OUT_COLS, np_ // _LANE, _LANE), jnp.float32),
        interpret=interpret,
    )(x3, ltab)
    return out3.reshape(OUT_COLS, np_)[:, :n]


def xla_reference_shade(xt, ltab, presence, dist_sets, lcidx,
                        lpresent, emi_cols, min_depth, rr_threshold,
                        full_phi):
    """cbody_shade as plain XLA (parity oracle + backward twin)."""
    outs = cbody_shade(lambda i: xt[i], lambda r, c: ltab[r, c],
                       ltab.shape[0], presence=presence,
                       dist_sets=dist_sets, lcidx=lcidx,
                       lpresent=lpresent, emi_cols=emi_cols,
                       min_depth=min_depth, rr_threshold=rr_threshold,
                       full_phi=full_phi)
    return jnp.stack(outs, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7,
                                                    8, 9, 10))
def shade_split_t(xt, ltab, presence, dist_sets, lcidx, lpresent,
                  emi_cols, min_depth, rr_threshold, full_phi,
                  interpret=False):
    """Kernel B (textured split path) over [SHADE_IN_COLS, N].
    Differentiable w.r.t. xt (which carries the texture-resolved
    material columns — gradients flow back into the texture pool and
    material table through XLA's resolve_params) and ltab."""
    return _run_shade(xt, ltab, presence, dist_sets, lcidx, lpresent,
                      emi_cols, min_depth, rr_threshold, full_phi,
                      interpret)


def _fwd_shade(xt, ltab, presence, dist_sets, lcidx, lpresent,
               emi_cols, min_depth, rr_threshold, full_phi, interpret):
    out = shade_split_t(xt, ltab, presence, dist_sets, lcidx,
                        lpresent, emi_cols, min_depth, rr_threshold,
                        full_phi, interpret)
    return out, (xt, ltab)


def _bwd_shade(presence, dist_sets, lcidx, lpresent, emi_cols,
               min_depth, rr_threshold, full_phi, interpret, res, ct):
    xt, ltab = res
    _, vjp = jax.vjp(
        lambda x_, lt_: xla_reference_shade(
            x_, lt_, presence, dist_sets, lcidx, lpresent, emi_cols,
            min_depth, rr_threshold, full_phi),
        xt, ltab)
    return vjp(ct)


shade_split_t.defvjp(_fwd_shade, _bwd_shade)


def unpack_hit_t(out):
    """[HIT_OUT_COLS, N] -> dict of row-form arrays."""
    v3 = lambda j: jnp.stack([out[j], out[j + 1], out[j + 2]], -1)
    v2 = lambda j: jnp.stack([out[j], out[j + 1]], -1)
    return dict(
        pos=v3(0), pos_err=v3(3), ng=v3(6), ns=v3(9), dpdu=v3(12),
        dpdv=v3(15), uv=v2(18), duvdx=v2(20), duvdy=v2(22),
        mat_id=out[24].astype(jnp.int32),
        light_id=out[25].astype(jnp.int32), cone_w=out[26])
