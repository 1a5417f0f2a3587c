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
    lt = jnp.asarray(scene.lights.ltype)[lidx]
    return (lt == sc.L_POINT) | (lt == sc.L_SPOT)


def light_sample(scene: sc.SceneData, lidx, pos, u2):
    """Sample an incoming direction from light lidx [N] toward pos
    [N,3].  Returns dict(radiance, pdf, pfrom, wi, dist2, delta)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    lights = scene.lights
    lt = lights.ltype[lidx]
    emission = lights.emission[lidx]
    n = pos.shape[0]
    sg = jax.lax.stop_gradient

    # ---- area sphere (in the sphere's local frame) ---------------------
    s_idx = jnp.clip(lights.prim[lidx], 0, scene.spheres.count - 1)
    w2o = scene.spheres.w2o[s_idx]
    o2w = scene.spheres.o2w[s_idx]
    pos_local = jax.vmap(tf.transform_point)(w2o, pos)
    lp_l, ln_l, pdf_area_s = sph.sample_sphere_local(
        scene.spheres, s_idx, u2)
    lp_l, ln_l = sg(lp_l), sg(ln_l)
    wi_l = lp_l - pos_local
    d2_l = length2(wi_l)
    wi_ln = wi_l * jax.lax.rsqrt(jnp.maximum(d2_l, 1e-20))[..., None]
    # solid-angle conversion (ref: shape/mod.rs:52-64)
    denom = jnp.abs(dot(ln_l, wi_ln))
    pdf_s = pdf_area_s * d2_l / jnp.maximum(denom, 1e-20)
    pdf_s = jnp.where((d2_l < 1e-12) | ~jnp.isfinite(pdf_s), 0.0, pdf_s)
    # front-facing emission only (ref: component/shape.rs:115-128)
    front_s = dot(pos_local - lp_l, ln_l) > 0.0
    pfrom_s = jax.vmap(tf.transform_point)(o2w, lp_l)
    rad_s = jnp.where(front_s[..., None], emission, 0.0)
    uv_s, _, _ = sph._local_duv(
        lp_l, scene.spheres.radius[s_idx],
        scene.spheres.thetamin[s_idx], scene.spheres.thetamax[s_idx],
        scene.spheres.phimax[s_idx])

    # ---- area triangle -------------------------------------------------
    has_tris = scene.n_tris > 0
    t_idx = jnp.clip(lights.prim[lidx], 0,
                     max(scene.n_tris - 1, 0))
    if has_tris:
        tv0 = scene.tri_v0[t_idx]
        tv1 = scene.tri_v1[t_idx]
        tv2 = scene.tri_v2[t_idx]
        tn0 = scene.tri_n0[t_idx]
        tn1 = scene.tri_n1[t_idx]
        tn2 = scene.tri_n2[t_idx]
        bary = sg(warps.sample_uniform_triangle(u2))
        lp_t, ln_t, pdf_area_t = tri.sample_tri(
            tv0, tv1, tv2, tn0, tn1, tn2, bary)
        wi_t = lp_t - pos
        d2_t = length2(wi_t)
        wi_tn = wi_t * jax.lax.rsqrt(jnp.maximum(d2_t, 1e-20))[..., None]
        denom_t = jnp.abs(dot(ln_t, wi_tn))
        pdf_t = pdf_area_t * d2_t / jnp.maximum(denom_t, 1e-20)
        pdf_t = jnp.where((d2_t < 1e-12) | ~jnp.isfinite(pdf_t), 0.0,
                          pdf_t)
        front_t = dot(pos - lp_t, ln_t) > 0.0
        rad_t = jnp.where(front_t[..., None], emission, 0.0)
        uv_t = (bary[..., 0:1] * scene.tri_uv0[t_idx]
                + bary[..., 1:2] * scene.tri_uv1[t_idx]
                + bary[..., 2:3] * scene.tri_uv2[t_idx])
    else:
        lp_t = jnp.zeros_like(pos)
        pdf_t = jnp.zeros((n,), jnp.float32)
        rad_t = jnp.zeros_like(pos)
        uv_t = jnp.zeros((n, 2), jnp.float32)

    # ---- point ---------------------------------------------------------
    lpos = lights.pos[lidx]
    wi_p = lpos - pos
    d2_p = length2(wi_p)
    rad_p = emission / jnp.maximum(d2_p, 1e-20)[..., None]
    pdf_p = jnp.ones((n,), jnp.float32)

    # ---- spot ----------------------------------------------------------
    axis = normalize(lights.aux[lidx])
    cos_total = lights.params[lidx, 0]
    cos_falloff = lights.params[lidx, 1]
    wi_pn = wi_p * jax.lax.rsqrt(jnp.maximum(d2_p, 1e-20))[..., None]
    cos_to = dot(-wi_pn, axis)
    # quartic falloff (ref: pointlights.rs:146-159)
    tt = jnp.clip((cos_to - cos_total)
                  / jnp.maximum(cos_falloff - cos_total, 1e-8), 0.0, 1.0)
    falloff = jnp.where(cos_to < cos_total, 0.0,
                        jnp.where(cos_to > cos_falloff, 1.0,
                                  (tt * tt) * (tt * tt)))
    rad_sp = rad_p * falloff[..., None]

    # ---- distant -------------------------------------------------------
    ldir = normalize(lights.pos[lidx])       # direction the light travels
    wr = lights.params[lidx, 0]
    pfrom_d = pos - ldir * (2.0 * jnp.maximum(wr, 1.0))[..., None]
    rad_d = jnp.broadcast_to(emission, (n, 3))
    pdf_d = jnp.ones((n,), jnp.float32)

    # ---- combine by type ----------------------------------------------
    def pick(sphere_v, tri_v, point_v, spot_v, distant_v):
        def sel(c, a, b):
            return jnp.where(c[..., None] if a.ndim == 2 else c, a, b)
        out = sel(lt == sc.L_AREA_SPHERE, sphere_v, tri_v)
        out = sel(lt == sc.L_POINT, point_v, out)
        out = sel(lt == sc.L_SPOT, spot_v, out)
        out = sel(lt == sc.L_DISTANT, distant_v, out)
        return out

    pfrom = pick(pfrom_s, lp_t, jnp.broadcast_to(lpos, (n, 3)),
                 jnp.broadcast_to(lpos, (n, 3)), pfrom_d)
    radiance = pick(rad_s, rad_t, rad_p, rad_sp, rad_d)
    pdf = pick(pdf_s, pdf_t, pdf_p, pdf_p, pdf_d)
    zero_uv = jnp.zeros((n, 2), jnp.float32)
    uv = jnp.where((lt == sc.L_AREA_SPHERE)[..., None], uv_s,
                   jnp.where((lt == sc.L_AREA_TRI)[..., None], uv_t,
                             zero_uv))
    wi = normalize(pfrom - pos)
    # light-surface normal at pfrom (area lights; BPT MIS needs it —
    # delta/distant lanes fall back to -wi, unused through is_surface)
    n_s_world = normalize(jax.vmap(tf.transform_vector)(o2w, ln_l))
    nl = pick(n_s_world, ln_t if has_tris else -wi, -wi, -wi, -wi)
    return dict(radiance=radiance, pdf=pdf, pfrom=pfrom, wi=wi, nl=nl,
                uv=uv, delta=is_delta_light(scene, lidx))


def light_pdf_wi(scene: sc.SceneData, lidx, pos, wi):
    """Light::pdf(pos, wi) for MIS (ref: shape/mod.rs:67-75 pdf_wrt via
    re-intersection; delta lights return 0)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    lights = scene.lights
    lt = lights.ltype[lidx]
    n = pos.shape[0]

    # sphere area light: intersect that sphere in local frame
    s_idx = jnp.clip(lights.prim[lidx], 0, scene.spheres.count - 1)
    w2o = scene.spheres.w2o[s_idx]
    pos_l = jax.vmap(tf.transform_point)(w2o, pos)
    wi_l = jax.vmap(tf.transform_vector)(w2o, wi)
    radius = scene.spheres.radius[s_idx]
    hit_s, t_s, p_l = sph._intersect_local(
        pos_l, wi_l, jnp.full((n,), jnp.inf, jnp.float32),
        radius, scene.spheres.zmin[s_idx], scene.spheres.zmax[s_idx],
        scene.spheres.phimax[s_idx])
    # normal at hit = p/r (geometric, local); area in local frame
    n_l = p_l * jax.lax.rsqrt(
        jnp.maximum(length2(p_l), 1e-20))[..., None]
    area_s = (scene.spheres.phimax[s_idx] * radius
              * (scene.spheres.zmax[s_idx] - scene.spheres.zmin[s_idx]))
    d2_s = length2(p_l - pos_l)
    pdf_s = d2_s / (jnp.maximum(jnp.abs(dot(wi_l, n_l)), 1e-20) * area_s)
    pdf_s = jnp.where(hit_s & jnp.isfinite(pdf_s), pdf_s, 0.0)

    # triangle area light: intersect that one triangle
    if scene.n_tris > 0:
        t_idx = jnp.clip(lights.prim[lidx], 0, scene.n_tris - 1)
        hit_t, t_t = tri.intersect_one(
            pos, wi, jnp.full((n,), jnp.inf, jnp.float32),
            scene.tri_v0[t_idx], scene.tri_v1[t_idx],
            scene.tri_v2[t_idx])
        v0 = scene.tri_v0[t_idx]
        v1 = scene.tri_v1[t_idx]
        v2 = scene.tri_v2[t_idx]
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
    wi = ls["wi"]
    no_effect = (ls["pdf"] == 0.0) | spec.is_black(ls["radiance"])
    f_raw, _ = sl.bsdf_evaluate(bsdf, wo, wi, ALL)
    f = f_raw * jnp.abs(dot(wi, bsdf.ns))[..., None]
    spdf = sl.bsdf_pdf(bsdf, wo, wi, ALL)
    f = jnp.where((spdf == 0.0)[..., None], 0.0, f)
    need_shadow = ~no_effect & ~spec.is_black(f)
    blocked = _occlusion_query(scene, hit, ls["pfrom"], n_alive=n_alive)
    f = jnp.where(blocked[..., None], 0.0, f)
    safe_lpdf = jnp.maximum(ls["pdf"], 1e-20)
    w_mis = warps.power_heuristic(1, ls["pdf"], 1, spdf)
    contrib_delta = ls["radiance"] * f / safe_lpdf[..., None]
    contrib_area = contrib_delta * w_mis[..., None]
    contrib = jnp.where(ls["delta"][..., None], contrib_delta,
                        contrib_area)
    contrib = jnp.where((need_shadow & ~no_effect)[..., None], contrib,
                        0.0)
    return spec.sanitize(contrib)


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
    is_spec = (kind2 & SPECULAR) != 0
    lpdf = light_pdf_wi(scene, lidx, pos, wi2)
    delta = is_delta_light(scene, lidx)
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
