"""Bidirectional path tracer, wavefront form.

Re-derivation of the reference's BPT (ref: src/renderer/bpt/mod.rs —
written but disabled there, renderer/mod.rs:21) on the same wavefront
SoA machinery as the forward PT: per pixel sample we grow a camera
subpath (<= max_depth+2 vertices, bpt/mod.rs:100-129) and a light
subpath (<= max_depth+1, bpt/mod.rs:131-158) via masked random walks
(bpt/mod.rs:160-222), then connect every (s,t) strategy
(bpt/mod.rs:234-328) with an iteratively computed MIS weight
(bpt/mod.rs:354-384, the standard Veach scheme over stored
forward/reverse area densities).  t=1 strategies sample the camera
lens and splat to arbitrary raster positions through the same
scatter-add film the PT uses (the reference uses full-frame
spawn_flat_tiles for this, film.rs:138-168).

Subpaths are stored as python lists of per-depth vertex records
(static strategy loops -> static indexing; every array is [N, ...]
over the wave).

Adjoint-completeness notes (verified against the reference, round 4):
* Shading-normal correction in importance transport mirrors
  correct_shading_normal (bpt/mod.rs:225-232) exactly; the reference
  applies NO eta^2 radiance-scaling asymmetry for specular refraction
  there either, so omitting it here is parity, not a deviation
  (a full Veach adjoint would add it; affects caustics through glass).
* The (s=1, t=1) strategy is omitted BECAUSE it is a no-op in the
  reference: Node::evaluate returns black for Light nodes
  (bpt/node.rs:97-110), and Node::is_connectible marks light nodes
  connectible only when they carry LIGHT_DDIR (bpt/node.rs:113-118),
  which area lights never do — so the reference's t==1 branch
  (bpt/mod.rs:258-282) never produces a (s=1,t=1) contribution.
  Direct light visibility is covered by the s=0 strategies.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from arendur_tpu import scene as sc
from arendur_tpu import spectrum as spec
from arendur_tpu import materials as mats
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import ALL, SPECULAR
from arendur_tpu.geometry.vec import dot, normalize, length2
from arendur_tpu.lighting import nee, emission as emi
from arendur_tpu.sampling import sampler as smp
from arendur_tpu.sampling.distribution import sample_discrete, discrete_pdf
from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm
from arendur_tpu.filming import importance as imp

# sampler dim blocks disjoint from the PT's (threefry counter space)
_LIGHT_WALK_BASE = 1024
_CONNECT_BASE = 4096


def _v3(x):
    return x[..., None]


def _safe_dir(a, b):
    seg = b - a
    d2 = length2(seg)
    w = seg * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))[..., None]
    return w, d2


def convert_density(pdf_dir, from_pos, to_pos, to_ng, to_on_surface):
    """Solid-angle density at from_pos -> area density at to_pos
    (ref: bpt/node.rs density conversion)."""
    w, d2 = _safe_dir(from_pos, to_pos)
    inv_d2 = 1.0 / jnp.maximum(d2, 1e-20)
    cos = jnp.where(to_on_surface, jnp.abs(dot(to_ng, w)), 1.0)
    return jnp.where(d2 > 0.0, pdf_dir * cos * inv_d2, 0.0)


def _vertex(n):
    """Empty vertex record of wave size n."""
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    return dict(
        valid=jnp.zeros((n,), bool), pos=z3, pos_err=z3, ns=z3, ng=z3,
        dpdu=z3, dpdv=z3, uv=jnp.zeros((n, 2), jnp.float32),
        mat_id=jnp.zeros((n,), jnp.int32),
        light_id=jnp.full((n,), -1, jnp.int32),
        beta=z3, pdf_fwd=z1, pdf_rev=z1,
        delta=jnp.zeros((n,), bool),
        is_surface=jnp.zeros((n,), bool))


def _vertex_bsdf(scene, config, v):
    return mats.compute_scattering(
        scene.materials, v["mat_id"], v["ns"], v["ng"], v["dpdu"],
        uv=v["uv"], textures=config.textures, dpdv=v["dpdv"],
        tex_filter=config.tex_filter)


def _random_walk(scene, config, ws, o, d, beta, pdf_dir, n_steps,
                 dim_base, importance_mode):
    """Masked wavefront random walk; returns a list of n_steps vertex
    records (invalid lanes flagged)."""
    n = o.shape[0]
    verts: List[dict] = []
    alive = jnp.ones((n,), bool) & (jnp.sum(d * d, -1) > 0.0)
    prev_pos = o
    prev_ng = d  # only used through dot products on dead lanes
    for i in range(n_steps):
        hit = sc.intersect(scene, o, d)
        valid = alive & hit.hit
        v = _vertex(n)
        v["valid"] = valid
        v["pos"] = hit.pos
        v["pos_err"] = hit.pos_err
        v["ns"] = hit.ns
        v["ng"] = hit.ng
        v["dpdu"] = hit.dpdu
        v["dpdv"] = hit.dpdv
        v["uv"] = hit.uv
        v["mat_id"] = hit.mat_id
        v["light_id"] = hit.light_id
        v["beta"] = jnp.where(_v3(valid), beta, 0.0)
        v["pdf_fwd"] = convert_density(
            pdf_dir, prev_pos, hit.pos, hit.ng,
            jnp.ones((n,), bool))
        v["is_surface"] = valid

        bsdf = _vertex_bsdf(scene, config, v)
        wo = -d
        u = ws.u2(dim_base + 4 * i)
        f, wi, pdf, kind = sl.bsdf_sample(bsdf, wo, u, ALL)
        is_spec = (kind & SPECULAR) != 0
        v["delta"] = valid & is_spec
        cont = valid & ~spec.is_black(f) & (pdf > 0.0) \
            & (jnp.sum(wi * wi, -1) > 1e-12)

        # reverse density at the previous vertex
        pdf_rev_dir = sl.bsdf_pdf(bsdf, wi, wo, ALL)
        pdf_rev_dir = jnp.where(is_spec, 0.0, pdf_rev_dir)
        pr = convert_density(pdf_rev_dir, hit.pos, prev_pos, prev_ng,
                             jnp.ones((n,), bool))
        if verts:
            verts[-1]["pdf_rev"] = jnp.where(valid, pr,
                                             verts[-1]["pdf_rev"])
        else:
            v0_pdf_rev = pr  # returned for the subpath root

        scale = jnp.abs(dot(wi, bsdf.ns)) / jnp.maximum(pdf, 1e-20)
        if importance_mode:
            # shading-normal correction for adjoint transport
            num = (jnp.abs(dot(wo, bsdf.ns)) * jnp.abs(dot(wi, bsdf.ng)))
            den = (jnp.abs(dot(wo, bsdf.ng)) * jnp.abs(dot(wi, bsdf.ns)))
            scale = scale * num / jnp.maximum(den, 1e-20)
        new_beta = beta * f * _v3(scale)
        ok = spec.valid(new_beta)
        beta = jnp.where(_v3(cont & ok), new_beta, beta)
        alive = cont & ok

        prev_pos = jnp.where(_v3(valid), hit.pos, prev_pos)
        prev_ng = jnp.where(_v3(valid), hit.ng, prev_ng)
        o = sc.offset_ray_origin(hit.pos, hit.pos_err, hit.ng, wi)
        safe_wi = jnp.where(_v3(jnp.sum(wi * wi, -1) < 1e-12),
                            jnp.asarray([0.0, 0.0, 1.0]), wi)
        d = normalize(safe_wi)
        pdf_dir = pdf   # specular slots report pdf=1 with delta flagged
        verts.append(v)
    return verts, (v0_pdf_rev if n_steps > 0 else None)


def _remap0(x):
    return jnp.where(x > 0.0, x, 1.0)


def _light_origin_pdf(scene, lidx):
    """pdfChoice * pdfPos (area) for light lidx (PdfLightOrigin)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    choice = discrete_pdf(scene.light_distribution, lidx)
    return choice * emi.pdf_origin(scene, lidx)


def _light_dir_pdf_to(scene, lidx, lpos, lng, to_pos, to_ng, to_surf):
    """PdfLight: emission direction density from light toward to_pos,
    converted to area at to_pos."""
    w, d2 = _safe_dir(lpos, to_pos)
    pdf_dir = emi.pdf_dir_at(scene, lidx, lng, w)
    return convert_density(pdf_dir, lpos, to_pos, to_ng, to_surf)


def _bsdf_pdf_to(scene, config, v, prev_pos, next_pos, next_ng,
                 next_surf):
    """Vertex::Pdf for a surface vertex: bsdf pdf of scattering
    prev->v->next converted to area density at next."""
    bsdf = _vertex_bsdf(scene, config, v)
    wo, _ = _safe_dir(v["pos"], prev_pos)
    wi, _ = _safe_dir(v["pos"], next_pos)
    pdf_dir = sl.bsdf_pdf(bsdf, wo, wi, ALL)
    return convert_density(pdf_dir, v["pos"], next_pos, next_ng,
                           next_surf)


def mis_weight(scene, config, camera, resolution, cam_vs, light_vs,
               s, t, lidx, sampled_light=None, sampled_cam=None):
    """Veach iterative MIS weight for strategy (s,t), vectorized over
    the wave (ref: bpt/mod.rs:354-384; pbrt 16.3 MISWeight)."""
    n = cam_vs[0]["pos"].shape[0]
    one = jnp.ones((n,), jnp.float32)
    if s + t == 2:
        return one

    # effective junction vertices (sampled overrides for s==1 / t==1)
    qs = sampled_light if (s == 1 and sampled_light is not None) else (
        light_vs[s - 1] if s > 0 else None)
    pt = sampled_cam if (t == 1 and sampled_cam is not None) else \
        cam_vs[t - 1]
    qs_minus = light_vs[s - 2] if s > 1 else None
    pt_minus = cam_vs[t - 2] if t > 1 else None

    # --- junction reverse-density overrides (pbrt a4-a7) ---
    if s > 0:
        if s == 1:
            # light vertex density toward pt: emission dir pdf
            pt_rev = _light_dir_pdf_to(
                scene, lidx, qs["pos"], qs["ns"], pt["pos"], pt["ng"],
                pt["is_surface"])
        else:
            pt_rev = _bsdf_pdf_to(scene, config, qs, qs_minus["pos"],
                                  pt["pos"], pt["ng"], pt["is_surface"])
    else:
        # s == 0: pt lies on a light; origin density
        pt_rev = _light_origin_pdf(scene, jnp.maximum(pt["light_id"], 0))
        pt_rev = jnp.where(pt["light_id"] >= 0, pt_rev, 0.0)

    if t > 1:
        if s > 0:
            ptm_rev = _bsdf_pdf_to(scene, config, pt, qs["pos"],
                                   pt_minus["pos"], pt_minus["ng"],
                                   pt_minus["is_surface"])
        else:
            lid_pt = jnp.maximum(pt["light_id"], 0)
            ptm_rev = _light_dir_pdf_to(
                scene, lid_pt, pt["pos"], pt["ns"], pt_minus["pos"],
                pt_minus["ng"], pt_minus["is_surface"])
            ptm_rev = jnp.where(pt["light_id"] >= 0, ptm_rev, 0.0)
    else:
        ptm_rev = None

    if s > 0:
        if t == 1:
            # camera vertex density toward qs
            w, _ = _safe_dir(pt["pos"], qs["pos"])
            _, pdf_dir = imp.importance_pdf(camera, pt["pos"], w,
                                            resolution)
            qs_rev = convert_density(pdf_dir, pt["pos"], qs["pos"],
                                     qs["ng"], qs["is_surface"])
        else:
            qs_rev = _bsdf_pdf_to(scene, config, pt, pt_minus["pos"],
                                  qs["pos"], qs["ng"], qs["is_surface"])
    else:
        qs_rev = None

    if s > 1:
        qsm_rev = _bsdf_pdf_to(scene, config, qs, pt["pos"],
                               qs_minus["pos"], qs_minus["ng"],
                               qs_minus["is_surface"])
    else:
        qsm_rev = None

    def rev_of_cam(i):
        if i == t - 1:
            return pt_rev
        if i == t - 2 and ptm_rev is not None:
            return ptm_rev
        return cam_vs[i]["pdf_rev"]

    def rev_of_light(i):
        if i == s - 1:
            return qs_rev
        if i == s - 2 and qsm_rev is not None:
            return qsm_rev
        return light_vs[i]["pdf_rev"]

    def fwd_of_light(i):
        if i == s - 1 and s == 1 and sampled_light is not None:
            return sampled_light["pdf_fwd"]
        return light_vs[i]["pdf_fwd"]

    def delta_cam(i):
        if i == t - 1 or i == t - 2:
            return jnp.zeros((n,), bool)  # junction made connectible
        return cam_vs[i]["delta"]

    def delta_light(i):
        if i == s - 1 and s == 1 and sampled_light is not None:
            return sampled_light["delta"]
        if i == s - 1 or (i == s - 2 and s >= 2):
            if i == 0:
                return light_vs[0]["delta"]
            return jnp.zeros((n,), bool)
        return light_vs[i]["delta"]

    sum_ri = jnp.zeros((n,), jnp.float32)
    # camera side: hypothetical strategies extending the light path
    ri = one
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(rev_of_cam(i)) / _remap0(cam_vs[i]["pdf_fwd"])
        not_delta = ~delta_cam(i) & ~(delta_cam(i - 1)
                                      if i - 1 > 0
                                      else jnp.zeros((n,), bool))
        sum_ri = sum_ri + jnp.where(not_delta, ri, 0.0)
    # light side
    ri = one
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(rev_of_light(i)) / _remap0(fwd_of_light(i))
        if i > 0:
            prev_delta = delta_light(i - 1)
        else:
            prev_delta = jnp.zeros((n,), bool)
        sum_ri = sum_ri + jnp.where(~delta_light(i) & ~prev_delta,
                                    ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


def _g_term(scene, va_pos, va_err, va_ng, va_ns, va_surf,
            vb_pos, vb_ns, vb_surf):
    """Visibility-tested geometric term between two vertices
    (ref: bpt/mod.rs:330-352)."""
    w, d2 = _safe_dir(va_pos, vb_pos)
    g = 1.0 / jnp.maximum(d2, 1e-20)
    g = g * jnp.where(va_surf, jnp.abs(dot(va_ns, w)), 1.0)
    g = g * jnp.where(vb_surf, jnp.abs(dot(vb_ns, w)), 1.0)
    o = sc.offset_ray_origin(va_pos, va_err, va_ng, w)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    blocked = sc.occluded(scene, o, w, dist * (1.0 - 1e-3))
    return jnp.where(blocked, 0.0, g)


def _eval_f(scene, config, v, toward_prev, toward_next,
            importance_mode=False):
    """f at surface vertex v for prev->v->next, including the adjoint
    shading-normal correction in importance mode."""
    bsdf = _vertex_bsdf(scene, config, v)
    wo, _ = _safe_dir(v["pos"], toward_prev)
    wi, _ = _safe_dir(v["pos"], toward_next)
    f, _ = sl.bsdf_evaluate(bsdf, wo, wi, ALL)
    if importance_mode:
        num = (jnp.abs(dot(wo, bsdf.ns)) * jnp.abs(dot(wi, bsdf.ng)))
        den = (jnp.abs(dot(wo, bsdf.ng)) * jnp.abs(dot(wi, bsdf.ns)))
        f = f * _v3(num / jnp.maximum(den, 1e-20))
    return f


def trace_wave_bpt(scene: sc.SceneData, camera: cam.CameraData,
                   config, film_cfg, pixel_xy, pixel_id, sample_id,
                   base_key, collect: Optional[dict] = None):
    """Trace one BPT wave.  Returns (pfilm [N,2], L [N,3],
    splat_praster [K*N,2], splat_L [K*N,3], splat_valid [K*N]) where
    the splat arrays hold the t=1 light-tracing contributions.

    collect: optional dict filled with per-strategy diagnostics
    {(s,t): (contribution [N,3], mis_weight [N])} for tests/debugging."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    n = pixel_xy.shape[0]
    resolution = film_cfg.resolution
    ws = smp.WaveSampler(base_key, pixel_id, sample_id,
                         kind=config.sampler,
                         sobol_table=config.sobol_table,
                         sample_dx=config.sample_dx,
                         sample_dy=config.sample_dy)
    max_depth = config.max_depth
    n_cam = max_depth + 1      # surface vertices on the camera path
    n_light = max_depth        # surface vertices on the light path

    # ---- camera subpath -------------------------------------------------
    pfilm = pixel_xy + ws.film_jitter()
    plens = ws.u2(2)
    o, d = cam.generate_rays(camera, pfilm, plens)
    cam_v0 = _vertex(n)
    cam_v0["valid"] = jnp.ones((n,), bool)
    cam_v0["pos"] = o
    cam_v0["ns"] = normalize(d)
    cam_v0["ng"] = normalize(d)
    cam_v0["beta"] = jnp.ones((n, 3), jnp.float32)
    cam_v0["pdf_fwd"] = jnp.ones((n,), jnp.float32)
    _, pdf_dir0 = imp.importance_pdf(camera, o, normalize(d), resolution)
    cam_walk, cam0_rev = _random_walk(
        scene, config, ws, o, d, jnp.ones((n, 3), jnp.float32),
        pdf_dir0, n_cam, smp.BOUNCE_DIM_BASE, importance_mode=False)
    cam_vs = [cam_v0] + cam_walk

    # ---- light subpath --------------------------------------------------
    u_sel = ws.u1(_LIGHT_WALK_BASE - 1)
    lidx, l_choice_pdf = sample_discrete(
        as_jax(scene.light_distribution), u_sel)
    gp = emi.generate_path(scene, lidx, ws.u2(_LIGHT_WALK_BASE),
                           ws.u2(_LIGHT_WALK_BASE + 2),
                           textures=config.textures)
    light_delta_origin = ((scene.lights.ltype[lidx] == sc.L_POINT)
                          | (scene.lights.ltype[lidx] == sc.L_SPOT)
                          | (scene.lights.ltype[lidx] == sc.L_DISTANT))
    lv0 = _vertex(n)
    lv0["valid"] = jnp.ones((n,), bool)
    lv0["pos"] = gp["pos"]
    lv0["ns"] = gp["n"]
    lv0["ng"] = gp["n"]
    lv0["light_id"] = lidx
    lv0["delta"] = light_delta_origin
    lv0["is_surface"] = ~light_delta_origin
    safe_pp = jnp.maximum(gp["pdf_pos"], 1e-20)
    lv0["pdf_fwd"] = l_choice_pdf * gp["pdf_pos"]
    lv0["beta"] = gp["le"] / _v3(l_choice_pdf * jnp.where(
        gp["pdf_pos"] > 0.0, safe_pp, 1.0))
    cosl = jnp.where(light_delta_origin, 1.0,
                     jnp.abs(dot(gp["n"], gp["dir"])))
    safe_pd = jnp.maximum(gp["pdf_dir"], 1e-20)
    walk_beta = lv0["beta"] * _v3(
        cosl / jnp.where(gp["pdf_dir"] > 0.0, safe_pd, 1.0))
    walk_beta = jnp.where(_v3(gp["pdf_dir"] > 0.0), walk_beta, 0.0)
    o_l = gp["pos"] + gp["n"] * 1e-4 * jnp.where(
        _v3(light_delta_origin), 0.0, 1.0)
    light_walk, lw0_rev = _random_walk(
        scene, config, ws, o_l, gp["dir"], walk_beta, gp["pdf_dir"],
        n_light, _LIGHT_WALK_BASE + 8, importance_mode=True)
    if light_walk and lw0_rev is not None:
        lv0["pdf_rev"] = jnp.where(light_walk[0]["valid"], lw0_rev, 0.0)
    light_vs = [lv0] + light_walk

    # ---- strategies -------------------------------------------------------
    L = jnp.zeros((n, 3), jnp.float32)
    splat_praster: List = []
    splat_L: List = []
    splat_valid: List = []


    for t in range(2, n_cam + 2):
        for s in range(0, n_light + 2):
            if s + t > max_depth + 2:
                continue
            pt = cam_vs[t - 1]
            if s == 0:
                # camera path hit a light directly
                is_light = pt["valid"] & (pt["light_id"] >= 0)
                le = sc.light_emission(scene.lights, pt["light_id"],
                                       pt["uv"], config.textures)
                c = pt["beta"] * le
                w = mis_weight(scene, config, camera, resolution,
                               cam_vs, light_vs, s, t,
                               jnp.maximum(pt["light_id"], 0))
                contrib = jnp.where(_v3(is_light), c * _v3(w), 0.0)
                if collect is not None:
                    collect[(s, t)] = (contrib, w)
                L = L + contrib
                continue
            if s == 1:
                # sample the light toward pt (NEE-like connection)
                u_l = ws.u2(_CONNECT_BASE + 4 * (t * 8 + s))
                ls = nee.light_sample(scene, lidx, pt["pos"], u_l)
                active = pt["valid"] & ~pt["delta"] & (ls["pdf"] > 0.0) \
                    & ~spec.is_black(ls["radiance"])
                f_pt = _eval_f(scene, config, pt,
                               cam_vs[t - 2]["pos"], ls["pfrom"])
                cos_pt = jnp.abs(dot(ls["wi"], pt["ns"]))
                blocked = nee._occlusion_query(
                    scene, sc.Hit(
                        hit=pt["valid"], t=jnp.zeros((n,)),
                        prim=jnp.zeros((n,), jnp.int32),
                        pos=pt["pos"], pos_err=pt["pos_err"],
                        ng=pt["ng"], ns=pt["ns"], dpdu=pt["dpdu"],
                        dpdv=pt["dpdv"], uv=pt["uv"],
                        mat_id=pt["mat_id"], light_id=pt["light_id"]),
                    ls["pfrom"])
                c = (pt["beta"] * f_pt * ls["radiance"]
                     * _v3(cos_pt / jnp.maximum(
                         ls["pdf"] * l_choice_pdf, 1e-20)))
                c = jnp.where(_v3(active & ~blocked), c, 0.0)
                # sampled light vertex for MIS
                samp = _vertex(n)
                samp["pos"] = ls["pfrom"]
                samp["ns"] = ls["nl"]
                samp["ng"] = ls["nl"]
                samp["is_surface"] = ~ls["delta"]
                samp["delta"] = ls["delta"]
                samp["pdf_fwd"] = _light_origin_pdf(scene, lidx)
                w = mis_weight(scene, config, camera, resolution,
                               cam_vs, light_vs, s, t, lidx,
                               sampled_light=samp)
                contrib = spec.sanitize(c * _v3(w))
                if collect is not None:
                    collect[(s, t)] = (contrib, w)
                L = L + contrib
                continue
            # s >= 2: surface-surface connection
            qs = light_vs[s - 1]
            active = (pt["valid"] & qs["valid"] & ~pt["delta"]
                      & ~qs["delta"])
            f_pt = _eval_f(scene, config, pt, cam_vs[t - 2]["pos"],
                           qs["pos"])
            f_qs = _eval_f(scene, config, qs, light_vs[s - 2]["pos"],
                           pt["pos"], importance_mode=True)
            g = _g_term(scene, pt["pos"], pt["pos_err"], pt["ng"],
                        pt["ns"], pt["is_surface"], qs["pos"],
                        qs["ns"], qs["is_surface"])
            c = pt["beta"] * f_pt * f_qs * qs["beta"] * _v3(g)
            c = jnp.where(_v3(active), c, 0.0)
            w = mis_weight(scene, config, camera, resolution,
                           cam_vs, light_vs, s, t, lidx)
            contrib = spec.sanitize(c * _v3(w))
            if collect is not None:
                collect[(s, t)] = (contrib, w)
            L = L + contrib

    # ---- t == 1 strategies (light tracing, splatted) ---------------------
    for s in range(2, n_light + 2):
        if s + 1 > max_depth + 2:
            continue
        qs = light_vs[s - 1]
        u_c = ws.u2(_CONNECT_BASE + 4 * (1 * 8 + s) + 2)
        cs = imp.importance_sample(camera, qs["pos"], u_c, resolution)
        active = qs["valid"] & ~qs["delta"] & cs["valid"] \
            & (cs["pdf"] > 0.0)
        f_qs = _eval_f(scene, config, qs, light_vs[s - 2]["pos"],
                       cs["pcam"], importance_mode=True)
        cos_qs = jnp.abs(dot(cs["wi"], qs["ns"]))
        # visibility qs -> lens point
        o_sh = sc.offset_ray_origin(qs["pos"], qs["pos_err"], qs["ng"],
                                    cs["wi"])
        seg = cs["pcam"] - o_sh
        dist = jnp.sqrt(jnp.maximum(length2(seg), 1e-20))
        blocked = sc.occluded(scene, o_sh,
                              seg / _v3(dist), dist * (1.0 - 1e-3))
        c = (qs["beta"] * f_qs
             * _v3(cs["we"] * cos_qs / jnp.maximum(cs["pdf"], 1e-20)))
        c = jnp.where(_v3(active & ~blocked), c, 0.0)
        samp_cam = _vertex(n)
        samp_cam["pos"] = cs["pcam"]
        fwd, _ = _safe_dir(cs["pcam"], qs["pos"])
        samp_cam["ns"] = fwd
        samp_cam["ng"] = fwd
        samp_cam["pdf_fwd"] = jnp.ones((n,), jnp.float32)
        w = mis_weight(scene, config, camera, resolution, cam_vs,
                       light_vs, s, 1, lidx, sampled_cam=samp_cam)
        contrib = spec.sanitize(c * _v3(w))
        if collect is not None:
            collect[(s, 1)] = (contrib, w)
        splat_praster.append(cs["praster"])
        splat_L.append(contrib)
        splat_valid.append(active & ~blocked)

    if splat_praster:
        sp = jnp.concatenate(splat_praster, 0)
        sl_ = jnp.concatenate(splat_L, 0)
        sv = jnp.concatenate(splat_valid, 0)
    else:
        sp = jnp.zeros((0, 2), jnp.float32)
        sl_ = jnp.zeros((0, 3), jnp.float32)
        sv = jnp.zeros((0,), bool)
    return pfilm, spec.sanitize(L), sp, sl_, sv


def render_bpt(scene: sc.SceneData, camera: cam.CameraData,
               film_cfg: flm.FilmConfig, config):
    """Full BPT render (ref: bpt/mod.rs:38-98).  Returns [H,W,3]."""
    w, h = film_cfg.resolution
    spp = config.spp
    base_key = smp.make_base_key(config.seed)
    state = flm.film_init(film_cfg, with_splat=True)
    total = w * h * spp
    wave = min(config.wave_size, total)

    @jax.jit
    def run_wave(state, ray_idx):
        pixel_id = ray_idx // spp
        sample_id = ray_idx % spp
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pixel_xy = jnp.stack([px, py], -1)
        valid = ray_idx < total
        pfilm, L, sp, sL, sv = trace_wave_bpt(
            scene, camera, config, film_cfg, pixel_xy,
            pixel_id.astype(jnp.int32), sample_id.astype(jnp.int32),
            base_key)
        state2 = flm.film_splat(film_cfg, state, pfilm, L, mask=valid)
        k = sp.shape[0] // max(pfilm.shape[0], 1)
        if k == 0:
            return state2
        # t=1 light-tracing contributions are film-density estimates:
        # accumulated additively and scaled by 1/spp at finalize
        # (ref: flat-tile splats, bpt/mod.rs:85-86, film.rs:138-168).
        vmask = sv & jnp.tile(valid, k)
        return flm.film_add_splat(film_cfg, state2, sp, sL, mask=vmask)

    n_waves = (total + wave - 1) // wave
    for i in range(n_waves):
        ray_idx = i * wave + jnp.arange(wave, dtype=jnp.int32)
        state = run_wave(state, ray_idx)
    return flm.film_finalize(state, film_cfg, splat_scale=1.0 / spp)
