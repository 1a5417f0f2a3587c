"""Light sampling and MIS next-event estimation.

Wavefront re-derivation of Scene::uniform_sample_one_light /
evaluate_direct (ref: src/renderer/scene.rs:58-167) plus the per-type
light sampling:

* area sphere lights — Shape::sample_wrt in the sphere's local frame
  through TransformedComposable (ref: shape/mod.rs:52-64,
  component/transformed.rs:103-158, sphere.rs:304-317);
* area triangle lights — barycentric sampling (triangle.rs:494-504;
  the reference's TriangleInstance::surface_area returns 0 due to a
  typo (`a` and `b` both x-z, triangle.rs:487-491) which silently
  disables emissive-mesh NEE — we implement the correct area);
* point lights — delta, radiance = I/d^2 (pointlights.rs:50-60);
* spot / distant — (pointlights.rs:146-208, distantlight.rs).

All branches are evaluated masked by light type and combined, since
each lane may have sampled a different light.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arendur_tpu.geometry import transform as tf
from arendur_tpu.geometry.vec import vec3, dot, cross, normalize, length2
from arendur_tpu.geometry import frame
from arendur_tpu import scene as sc
from arendur_tpu import spectrum as spec
from arendur_tpu.shapes import sphere as sph
from arendur_tpu.shapes import triangle as tri
from arendur_tpu.sampling import warps
from arendur_tpu.sampling.distribution import sample_discrete
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import ALL, SPECULAR

PI = float(jnp.pi)


def sample_one_light(scene: sc.SceneData, u):
    """Power-weighted light pick (ref: scene.rs:169-173)."""
    from arendur_tpu.geometry.vec import as_jax
    return sample_discrete(as_jax(scene.light_distribution), u)


def is_delta_light(scene: sc.SceneData, lidx):
    """Point and spot are delta (LIGHT_DPOS); the reference's distant
    light is LIGHT_INFINITE which is *not* delta (lighting/mod.rs:
    93-98), so it goes through the MIS path with Light::pdf == 0."""
    present = sc.light_types_present(scene.lights)
    if present is not None and not (
            sc.L_POINT in present or sc.L_SPOT in present):
        return jnp.zeros(lidx.shape, bool)
    lt = jnp.asarray(scene.lights.ltype)[lidx]
    return (lt == sc.L_POINT) | (lt == sc.L_SPOT)


def _sample_sphere_local_row(radius, zmin, zmax, thetamin, thetamax,
                             phimax, u2, theta_uniform=None):
    """sample_sphere_local (sphere.rs:304-317) over packed per-lane
    sphere parameters instead of SoA gathers."""
    if theta_uniform is None:
        theta_uniform = sph.THETA_UNIFORM_COMPAT
    phi = u2[..., 0] * phimax
    if theta_uniform:
        theta = u2[..., 1] * (thetamax - thetamin) + thetamin
        z = jnp.cos(theta)
    else:
        z = zmin / radius + u2[..., 1] * (zmax - zmin) / radius
        theta = frame.acos_poly(jnp.clip(z, -1.0 + 1e-7, 1.0 - 1e-7))
    st = jnp.sin(theta)
    nrm = vec3(st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta))
    p = nrm * radius[..., None]
    area = phimax * radius * (zmax - zmin)
    return p, nrm, 1.0 / area


# row-matrix transforms shared with the Pallas kernels
_tp16 = tf.transform_point_row16
_tv16 = tf.transform_vector_row16


def light_sample(scene: sc.SceneData, lidx, pos, u2):
    """Sample an incoming direction from light lidx [N] toward pos
    [N,3].  Returns dict(radiance, pdf, pfrom, wi, dist2, delta).

    All per-light state comes from one packed row gather
    (scene.light_pack); per-type branches for light types absent from
    the scene are never emitted."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    pack, cidx, present = sc.light_pack(scene)
    lp = pack[jnp.maximum(lidx, 0)]
    return light_sample_rows(lp, cidx, present, pos, u2)


def light_sample_rows(lp, cidx, present, pos, u2, need_uv: bool = True,
                      full_phi_spheres: bool = False):
    """light_sample over pre-gathered packed rows lp [N,C] — shared
    verbatim by the XLA path and the Pallas bounce mega-kernel.

    need_uv=False statically skips the sphere-uv computation (its
    atan2/acos have no Mosaic lowering); only valid when no area light
    carries an emission-profile texture."""
    col = lambda name: lp[:, cidx[name][0]:cidx[name][1]]
    col1 = lambda name: lp[:, cidx[name][0]]
    has = lambda t: present is None or t in present
    lt = col1("ltype").astype(jnp.int32)
    emission = col("emission")
    n = pos.shape[0]
    sg = jax.lax.stop_gradient
    zero3 = jnp.zeros((n, 3), jnp.float32)
    zero1 = jnp.zeros((n,), jnp.float32)
    zero_uv = jnp.zeros((n, 2), jnp.float32)

    # ---- area sphere (in the sphere's local frame) ---------------------
    if has(sc.L_AREA_SPHERE):
        w2o = col("s_w2o")
        o2w = col("s_o2w")
        pos_local = _tp16(w2o, pos)
        lp_l, ln_l, pdf_area_s = _sample_sphere_local_row(
            col1("s_radius"), col1("s_zmin"), col1("s_zmax"),
            col1("s_thetamin"), col1("s_thetamax"), col1("s_phimax"),
            u2)
        lp_l, ln_l = sg(lp_l), sg(ln_l)
        wi_l = lp_l - pos_local
        d2_l = length2(wi_l)
        wi_ln = wi_l * jax.lax.rsqrt(jnp.maximum(d2_l, 1e-20))[..., None]
        # solid-angle conversion (ref: shape/mod.rs:52-64)
        denom = jnp.abs(dot(ln_l, wi_ln))
        # pre-masked reciprocal (NaN-free reverse-mode; see
        # integrator bounce_step note)
        inv_den = jnp.where(denom > 1e-20,
                            1.0 / jnp.maximum(denom, 1e-20), 0.0)
        pdf_s = pdf_area_s * d2_l * inv_den
        pdf_s = jnp.where((d2_l < 1e-12) | ~jnp.isfinite(pdf_s), 0.0,
                          pdf_s)
        # front-facing emission only (ref: component/shape.rs:115-128)
        front_s = dot(pos_local - lp_l, ln_l) > 0.0
        pfrom_s = _tp16(o2w, lp_l)
        rad_s = jnp.where(front_s[..., None], emission, 0.0)
        if need_uv:
            uv_s, _, _ = sph._local_duv(
                lp_l, col1("s_radius"), col1("s_thetamin"),
                col1("s_thetamax"), col1("s_phimax"))
        else:
            uv_s = jnp.zeros(pos.shape[:-1] + (2,), jnp.float32)
        n_s_world = normalize(_tv16(o2w, ln_l))
    else:
        pfrom_s, rad_s, pdf_s, uv_s = zero3, zero3, zero1, zero_uv
        n_s_world = zero3

    # ---- area triangle -------------------------------------------------
    has_tris = has(sc.L_AREA_TRI) and "tri_v0" in cidx
    if has_tris:
        bary = sg(warps.sample_uniform_triangle(u2))
        lp_t, ln_t, pdf_area_t = tri.sample_tri(
            col("tri_v0"), col("tri_v1"), col("tri_v2"),
            col("tri_n0"), col("tri_n1"), col("tri_n2"), bary)
        wi_t = lp_t - pos
        d2_t = length2(wi_t)
        wi_tn = wi_t * jax.lax.rsqrt(jnp.maximum(d2_t, 1e-20))[..., None]
        denom_t = jnp.abs(dot(ln_t, wi_tn))
        inv_den_t = jnp.where(denom_t > 1e-20,
                              1.0 / jnp.maximum(denom_t, 1e-20), 0.0)
        pdf_t = pdf_area_t * d2_t * inv_den_t
        pdf_t = jnp.where((d2_t < 1e-12) | ~jnp.isfinite(pdf_t), 0.0,
                          pdf_t)
        front_t = dot(pos - lp_t, ln_t) > 0.0
        rad_t = jnp.where(front_t[..., None], emission, 0.0)
        uv_t = (bary[..., 0:1] * col("tri_uv0")
                + bary[..., 1:2] * col("tri_uv1")
                + bary[..., 2:3] * col("tri_uv2"))
    else:
        lp_t, pdf_t, rad_t, uv_t = zero3, zero1, zero3, zero_uv
        ln_t = zero3

    # ---- point / spot --------------------------------------------------
    lpos = col("pos")
    if has(sc.L_POINT) or has(sc.L_SPOT):
        wi_p = lpos - pos
        d2_p = length2(wi_p)
        rad_p = emission / jnp.maximum(d2_p, 1e-20)[..., None]
    else:
        rad_p = zero3
    pdf_p = jnp.ones((n,), jnp.float32)

    if has(sc.L_SPOT):
        axis = normalize(col("aux"))
        cos_total = col1("params")
        cos_falloff = lp[:, cidx["params"][0] + 1]
        wi_pn = wi_p * jax.lax.rsqrt(
            jnp.maximum(d2_p, 1e-20))[..., None]
        cos_to = dot(-wi_pn, axis)
        # quartic falloff (ref: pointlights.rs:146-159)
        tt = jnp.clip((cos_to - cos_total)
                      / jnp.maximum(cos_falloff - cos_total, 1e-8),
                      0.0, 1.0)
        falloff = jnp.where(cos_to < cos_total, 0.0,
                            jnp.where(cos_to > cos_falloff, 1.0,
                                      (tt * tt) * (tt * tt)))
        rad_sp = rad_p * falloff[..., None]
    else:
        rad_sp = zero3

    if has(sc.L_DISTANT):
        ldir = normalize(lpos)           # direction the light travels
        # world_radius resolved from the scene bsphere at build()
        # (ref: distantlight.rs:72-74 pfrom = pos - 2*world_radius*dir)
        wr = col1("params")
        pfrom_d = pos - ldir * (2.0 * jnp.maximum(wr, 1e-6))[..., None]
        rad_d = jnp.broadcast_to(emission, (n, 3))
    else:
        pfrom_d, rad_d = zero3, zero3
    pdf_d = jnp.ones((n,), jnp.float32)

    # ---- combine by type (only emitted branches) -----------------------
    def pick(sphere_v, tri_v, point_v, spot_v, distant_v, default):
        def sel(c, a, b):
            return jnp.where(c[..., None] if a.ndim == 2 else c, a, b)
        out = default
        if has(sc.L_AREA_TRI):
            out = sel(lt == sc.L_AREA_TRI, tri_v, out)
        if has(sc.L_AREA_SPHERE):
            out = sel(lt == sc.L_AREA_SPHERE, sphere_v, out)
        if has(sc.L_POINT):
            out = sel(lt == sc.L_POINT, point_v, out)
        if has(sc.L_SPOT):
            out = sel(lt == sc.L_SPOT, spot_v, out)
        if has(sc.L_DISTANT):
            out = sel(lt == sc.L_DISTANT, distant_v, out)
        return out

    lpos_b = jnp.broadcast_to(lpos, (n, 3))
    pfrom = pick(pfrom_s, lp_t, lpos_b, lpos_b, pfrom_d, zero3)
    radiance = pick(rad_s, rad_t, rad_p, rad_sp, rad_d, zero3)
    pdf = pick(pdf_s, pdf_t, pdf_p, pdf_p, pdf_d, zero1)
    uv = pick(uv_s, uv_t, zero_uv, zero_uv, zero_uv, zero_uv)
    wi = normalize(pfrom - pos)
    # light-surface normal at pfrom (area lights; BPT MIS needs it —
    # delta/distant lanes fall back to -wi, unused through is_surface)
    nl = pick(n_s_world, ln_t if has_tris else -wi, -wi, -wi, -wi, -wi)
    if present is not None and not (
            sc.L_POINT in present or sc.L_SPOT in present):
        delta = jnp.zeros((n,), bool)
    else:
        delta = (lt == sc.L_POINT) | (lt == sc.L_SPOT)
    return dict(radiance=radiance, pdf=pdf, pfrom=pfrom, wi=wi, nl=nl,
                uv=uv, delta=delta)


def light_pdf_wi(scene: sc.SceneData, lidx, pos, wi):
    """Light::pdf(pos, wi) for MIS (ref: shape/mod.rs:67-75 pdf_wrt via
    re-intersection; delta lights return 0)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    pack, cidx, present = sc.light_pack(scene)
    lp = pack[jnp.maximum(lidx, 0)]
    return light_pdf_wi_rows(lp, cidx, present, pos, wi)


def light_pdf_wi_rows(lp, cidx, present, pos, wi,
                      full_phi_spheres: bool = False):
    """light_pdf_wi over pre-gathered packed rows — shared by the XLA
    path and the Pallas bounce kernel.  full_phi_spheres=True
    statically skips the sphere phi-clip (atan2 has no Mosaic
    lowering); only valid when every sphere light is a full-phi
    sphere (host-checked)."""
    col = lambda name: lp[:, cidx[name][0]:cidx[name][1]]
    col1 = lambda name: lp[:, cidx[name][0]]
    has = lambda t: present is None or t in present
    lt = col1("ltype").astype(jnp.int32)
    n = pos.shape[0]

    # sphere area light: intersect that sphere in local frame
    if has(sc.L_AREA_SPHERE):
        w2o = col("s_w2o")
        pos_l = _tp16(w2o, pos)
        wi_l = _tv16(w2o, wi)
        radius = col1("s_radius")
        hit_s, t_s, p_l = sph._intersect_local(
            pos_l, wi_l, jnp.full((n,), jnp.inf, jnp.float32),
            radius, col1("s_zmin"), col1("s_zmax"), col1("s_phimax"),
            skip_phi_clip=full_phi_spheres)
        # normal at hit = p/r (geometric, local); area in local frame
        n_l = p_l * jax.lax.rsqrt(
            jnp.maximum(length2(p_l), 1e-20))[..., None]
        area_s = (col1("s_phimax") * radius
                  * (col1("s_zmax") - col1("s_zmin")))
        d2_s = length2(p_l - pos_l)
        pdf_s = d2_s / (jnp.maximum(jnp.abs(dot(wi_l, n_l)), 1e-20)
                        * area_s)
        pdf_s = jnp.where(hit_s & jnp.isfinite(pdf_s), pdf_s, 0.0)
    else:
        pdf_s = jnp.zeros((n,), jnp.float32)

    # triangle area light: intersect that one triangle
    if has(sc.L_AREA_TRI) and "tri_v0" in cidx:
        v0 = col("tri_v0")
        v1 = col("tri_v1")
        v2 = col("tri_v2")
        hit_t, t_t = tri.intersect_one(
            pos, wi, jnp.full((n,), jnp.inf, jnp.float32), v0, v1, v2)
        ng = normalize(cross(v1 - v0, v2 - v0))
        area_t = tri.tri_area(v0, v1, v2)
        d2_t = t_t * t_t
        pdf_t = d2_t / (jnp.maximum(jnp.abs(dot(wi, ng)), 1e-20) * area_t)
        pdf_t = jnp.where(hit_t & jnp.isfinite(pdf_t), pdf_t, 0.0)
    else:
        pdf_t = jnp.zeros((n,), jnp.float32)

    pdf = jnp.where(lt == sc.L_AREA_SPHERE, pdf_s,
                    jnp.where(lt == sc.L_AREA_TRI, pdf_t, 0.0))
    return pdf


def _occlusion_query(scene, hit: sc.Hit, pfrom, n_alive=None):
    """Shadow ray between the shading point and the light sample
    (ref: LightSample::occluded, lighting/mod.rs:125-133).  We offset
    the surface end robustly (interaction.rs offset) and shrink the
    far end."""
    d = pfrom - hit.pos
    o = sc.offset_ray_origin(hit.pos, hit.pos_err, hit.ng, d)
    seg = pfrom - o
    dist = jnp.sqrt(jnp.maximum(length2(seg), 1e-20))
    dirn = seg / dist[..., None]
    return sc.occluded(scene, o, dirn, dist * (1.0 - 1e-3),
                       n_alive=n_alive)


def direct_light_contrib(ls, f_raw, spdf, ns):
    """The light-branch contribution assuming UNOCCLUDED (the caller
    masks by the shadow query; ref scene.rs:92-126).  Shared verbatim
    by the XLA path and the Pallas bounce kernel.

    Returns (contrib [N,3], need_shadow [N])."""
    wi = ls["wi"]
    no_effect = (ls["pdf"] == 0.0) | spec.is_black(ls["radiance"])
    f = f_raw * jnp.abs(dot(wi, ns))[..., None]
    f = jnp.where((spdf == 0.0)[..., None], 0.0, f)
    need_shadow = ~no_effect & ~spec.is_black(f)
    # pre-masked reciprocal: a tiny light pdf overflows the division on
    # lanes later masked out; backward of the masked product would
    # emit 0 * inf = NaN (see integrator bounce_step note)
    inv_lpdf = jnp.where(ls["pdf"] > 1e-18,
                         1.0 / jnp.maximum(ls["pdf"], 1e-18), 0.0)
    w_mis = warps.power_heuristic(1, ls["pdf"], 1, spdf)
    contrib_delta = ls["radiance"] * f * inv_lpdf[..., None]
    contrib_area = contrib_delta * w_mis[..., None]
    contrib = jnp.where(ls["delta"][..., None], contrib_delta,
                        contrib_area)
    contrib = jnp.where((need_shadow & ~no_effect)[..., None], contrib,
                        0.0)
    return spec.sanitize(contrib), need_shadow


def light_branch(scene: sc.SceneData, hit: sc.Hit, bsdf: sl.BsdfSlots,
                 wo, lidx, ulight, n_alive=None, textures=None):
    """Light-sampling branch of evaluate_direct
    (ref: scene.rs:92-126).  Returns radiance [N,3] (caller divides by
    the light-selection pdf)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    ls = light_sample(scene, lidx, hit.pos, ulight)
    if textures is not None:
        ls["radiance"] = ls["radiance"] * sc.emission_tex_factor(
            scene.lights, lidx, ls["uv"], textures)
    from arendur_tpu.bxdf import pallas_shade as psh
    f_raw, spdf = psh.dispatch_eval_pdf(bsdf, wo, ls["wi"], ALL)
    contrib, need_shadow = direct_light_contrib(ls, f_raw, spdf,
                                                bsdf.ns)
    blocked = _occlusion_query(scene, hit, ls["pfrom"], n_alive=n_alive)
    return jnp.where(blocked[..., None], 0.0, contrib)


def path_mis_weight(scene: sc.SceneData, lidx, selpdf, pos, wi2, pdf2,
                    kind2, f2):
    """Deferred bsdf-sampling branch of evaluate_direct
    (ref: scene.rs:129-165), restructured for path reuse: instead of
    sampling an extra bsdf direction and re-intersecting the whole
    scene (a third full ray query per bounce), the *path continuation*
    sample doubles as the MIS bsdf sample.  This returns the scalar
    weight W [N] such that, when the continuation ray's next vertex
    lands on light `lidx`, adding

        beta_next * Le * W       (beta_next already contains f2*cos/pdf2)

    reproduces the reference's bsdf-branch term
    f2 * Le * w2 / pdf2 / selpdf in expectation (same sampling
    distribution, one shared sample instead of two independent ones).
    Delta lights return 0 (reference skips the branch, scene.rs:129);
    non-specular samples with zero light pdf return 0
    (scene.rs:141-142); specular samples use w2 = 1.
    """
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    pack, cidx, present = sc.light_pack(scene)
    lp = pack[jnp.maximum(lidx, 0)]
    return path_mis_weight_rows(lp, cidx, present, selpdf, pos, wi2,
                                pdf2, kind2, f2)


def path_mis_weight_rows(lp, cidx, present, selpdf, pos, wi2, pdf2,
                         kind2, f2, full_phi_spheres: bool = False):
    """path_mis_weight over pre-gathered packed light rows — shared by
    the XLA path and the Pallas bounce kernel."""
    col1 = lambda name: lp[:, cidx[name][0]]
    lt = col1("ltype").astype(jnp.int32)
    is_spec = (kind2 & SPECULAR) != 0
    lpdf = light_pdf_wi_rows(lp, cidx, present, pos, wi2,
                             full_phi_spheres=full_phi_spheres)
    if present is not None and not (
            sc.L_POINT in present or sc.L_SPOT in present):
        delta = jnp.zeros(lt.shape, bool)
    else:
        delta = (lt == sc.L_POINT) | (lt == sc.L_SPOT)
    active = (~delta & ~spec.is_black(f2) & (pdf2 > 0.0)
              & (is_spec | (lpdf > 0.0)))
    w2 = jnp.where(is_spec, 1.0,
                   warps.power_heuristic(1, pdf2, 1, lpdf))
    return jnp.where(active, w2 / jnp.maximum(selpdf, 1e-20), 0.0)


def uniform_sample_one_light(scene: sc.SceneData, hit: sc.Hit,
                             bsdf: sl.BsdfSlots, wo, u_select, ulight,
                             n_alive=None, textures=None):
    """ref: scene.rs:58-66.  Returns (direct, lidx, selpdf): the
    light-branch contribution (already divided by the selection pdf)
    plus the sampled light id / selection pdf the integrator needs to
    finish the deferred bsdf branch via path_mis_weight."""
    lidx, selpdf = sample_one_light(scene, u_select)
    term = light_branch(scene, hit, bsdf, wo, lidx, ulight,
                        n_alive=n_alive, textures=textures)
    return (term / jnp.maximum(selpdf, 1e-20)[..., None], lidx, selpdf)
