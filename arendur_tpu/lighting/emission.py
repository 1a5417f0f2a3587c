"""Light path generation (photon emission) and path pdfs — the
adjoint-transport side of every light type, needed by BPT light
subpaths.

Wavefront re-derivation of Light::generate_path / Light::pdf_path
(ref: src/lighting/mod.rs:40-63) per concrete type:

* area sphere/triangle — uniform-area position, cosine-weighted
  direction about the surface normal (ref: component/shape.rs:133-145,
  shape/triangle.rs:585-607);
* point — sphere-uniform direction, pdf_dir = 1/4pi
  (ref: pointlights.rs:63-74);
* spot — cone-uniform direction about the axis
  (ref: pointlights.rs:196-208);
* distant — disk-area position offset against the direction
  (ref: distantlight.rs:84-99).

Densities follow the bidirectional convention: pdf_pos is an area
density (0 marks a delta position: point/spot), pdf_dir a solid-angle
density (0 marks a delta direction: distant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arendur_tpu import scene as sc
from arendur_tpu.geometry import transform as tf
from arendur_tpu.geometry import frame
from arendur_tpu.geometry.vec import dot, cross, normalize, length2
from arendur_tpu.sampling import warps
from arendur_tpu.shapes import sphere as sph
from arendur_tpu.shapes import triangle as tri

PI = float(jnp.pi)


def _sphere_area(scene, s_idx):
    s = scene.spheres
    return (s.phimax[s_idx] * s.radius[s_idx]
            * (s.zmax[s_idx] - s.zmin[s_idx]))


def _cosine_dir_about(n_vec, u2):
    """Cosine-weighted world direction about normal n_vec [N,3]."""
    w_local = warps.sample_cosw_hemisphere(u2)
    t, b = frame.get_basis_from(n_vec)
    return frame.to_world(t, b, n_vec, w_local)


def generate_path(scene: sc.SceneData, lidx, u_pos, u_dir,
                  textures=None):
    """Sample an emitted ray from light lidx [N].

    Returns dict(pos [N,3], dir [N,3], n [N,3] light normal (= dir for
    delta lights), le [N,3], pdf_pos [N], pdf_dir [N]).  textures:
    optional atlas for area-light emission profiles evaluated at the
    sampled point (ref: shape/triangle.rs:541-626).
    """
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    lights = scene.lights
    lt = lights.ltype[lidx]
    emission = lights.emission[lidx]
    n = lidx.shape[0]

    # ---- area sphere ----------------------------------------------------
    s_idx = jnp.clip(lights.prim[lidx], 0, scene.spheres.count - 1)
    o2w = scene.spheres.o2w[s_idx]
    lp_l, ln_l, pdf_a_s = sph.sample_sphere_local(scene.spheres, s_idx,
                                                  u_pos)
    pos_s = jax.vmap(tf.transform_point)(o2w, lp_l)
    n_s = normalize(jax.vmap(tf.transform_vector)(o2w, ln_l))
    dir_s = _cosine_dir_about(n_s, u_dir)
    pdf_dir_s = warps.pdf_cosw_hemisphere(
        jnp.maximum(dot(dir_s, n_s), 0.0))

    # ---- area triangle ---------------------------------------------------
    if scene.n_tris > 0:
        t_idx = jnp.clip(lights.prim[lidx], 0, scene.n_tris - 1)
        tv0, tv1, tv2 = (scene.tri_v0[t_idx], scene.tri_v1[t_idx],
                         scene.tri_v2[t_idx])
        bary = warps.sample_uniform_triangle(u_pos)
        pos_t, n_t, pdf_a_t = tri.sample_tri(
            tv0, tv1, tv2, scene.tri_n0[t_idx], scene.tri_n1[t_idx],
            scene.tri_n2[t_idx], bary)
        dir_t = _cosine_dir_about(n_t, u_dir)
        pdf_dir_t = warps.pdf_cosw_hemisphere(
            jnp.maximum(dot(dir_t, n_t), 0.0))
        uv_t = (bary[..., 0:1] * scene.tri_uv0[t_idx]
                + bary[..., 1:2] * scene.tri_uv1[t_idx]
                + bary[..., 2:3] * scene.tri_uv2[t_idx])
    else:
        pos_t = jnp.zeros((n, 3), jnp.float32)
        n_t = jnp.zeros((n, 3), jnp.float32)
        dir_t = jnp.zeros((n, 3), jnp.float32)
        pdf_a_t = jnp.zeros((n,), jnp.float32)
        pdf_dir_t = jnp.zeros((n,), jnp.float32)
        uv_t = jnp.zeros((n, 2), jnp.float32)

    # ---- point / spot ----------------------------------------------------
    lpos = lights.pos[lidx]
    dir_p = warps.sample_uniform_sphere(u_dir)
    pdf_dir_p = jnp.full((n,), warps.pdf_uniform_sphere(), jnp.float32)
    axis = normalize(lights.aux[lidx])
    cos_total = lights.params[lidx, 0]
    w_cone = warps.sample_uniform_cone(u_dir, cos_total)
    t_ax, b_ax = frame.get_basis_from(axis)
    dir_sp = frame.to_world(t_ax, b_ax, axis, w_cone)
    pdf_dir_sp = warps.pdf_uniform_cone(cos_total)
    # spot falloff on the emitted direction (pointlights.rs:146-159)
    cos_falloff = lights.params[lidx, 1]
    cos_to = dot(dir_sp, axis)
    tt = jnp.clip((cos_to - cos_total)
                  / jnp.maximum(cos_falloff - cos_total, 1e-8), 0.0, 1.0)
    falloff = jnp.where(cos_to < cos_total, 0.0,
                        jnp.where(cos_to > cos_falloff, 1.0,
                                  (tt * tt) * (tt * tt)))

    # ---- distant ----------------------------------------------------------
    ldir = normalize(lights.pos[lidx])
    wr = jnp.maximum(lights.params[lidx, 0], 1e-6)
    wc = lights.aux[lidx]   # world_center (scene bsphere, build())
    t_d, b_d = frame.get_basis_from(ldir)
    disk = warps.sample_concentric_disk(u_pos)
    # ref: distantlight.rs:84-91 — disk of the world bsphere, pushed
    # back one radius against the travel direction
    pos_d = (wc + (disk[..., 0:1] * t_d + disk[..., 1:2] * b_d)
             * wr[..., None] - ldir * wr[..., None])
    pdf_pos_d = 1.0 / (PI * wr * wr)

    # ---- combine ----------------------------------------------------------
    def pick(sv, tv, pv, spv, dv):
        def sel(c, a, b):
            return jnp.where(c[..., None] if a.ndim == 2 else c, a, b)
        out = sel(lt == sc.L_AREA_SPHERE, sv, tv)
        out = sel(lt == sc.L_POINT, pv, out)
        out = sel(lt == sc.L_SPOT, spv, out)
        out = sel(lt == sc.L_DISTANT, dv, out)
        return out

    zeros = jnp.zeros((n,), jnp.float32)
    pos = pick(pos_s, pos_t, lpos, lpos, pos_d)
    dirn = pick(dir_s, dir_t, dir_p, dir_sp,
                jnp.broadcast_to(ldir, (n, 3)))
    nrm = pick(n_s, n_t, dir_p, dir_sp, jnp.broadcast_to(ldir, (n, 3)))
    le = pick(emission, emission, emission,
              emission * falloff[..., None], emission)
    if textures is not None:
        uv_sphere, _, _ = sph._local_duv(
            lp_l, scene.spheres.radius[s_idx],
            scene.spheres.thetamin[s_idx],
            scene.spheres.thetamax[s_idx],
            scene.spheres.phimax[s_idx])
        uv_area = jnp.where((lt == sc.L_AREA_SPHERE)[..., None],
                            uv_sphere, uv_t)
        le = le * sc.emission_tex_factor(lights, lidx, uv_area,
                                         textures)
    pdf_pos = pick(pdf_a_s, pdf_a_t, zeros, zeros,
                   pdf_pos_d)                     # 0 = delta position
    pdf_dir = pick(pdf_dir_s, pdf_dir_t, pdf_dir_p,
                   jnp.broadcast_to(pdf_dir_sp, (n,)), zeros)
    return dict(pos=pos, dir=dirn, n=nrm, le=le, pdf_pos=pdf_pos,
                pdf_dir=pdf_dir)


def pdf_dir_at(scene: sc.SceneData, lidx, n_light, w):
    """Solid-angle density of generate_path emitting direction w from
    a light with surface normal n_light (Light::pdf_path dir part)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    lights = scene.lights
    lt = lights.ltype[lidx]
    cosw = dot(w, n_light)
    pdf_area = warps.pdf_cosw_hemisphere(jnp.maximum(cosw, 0.0))
    axis = normalize(lights.aux[lidx])
    pdf_spot = jnp.where(dot(w, axis) >= lights.params[lidx, 0],
                         warps.pdf_uniform_cone(lights.params[lidx, 0]),
                         0.0)
    pdf = jnp.where((lt == sc.L_AREA_SPHERE) | (lt == sc.L_AREA_TRI),
                    pdf_area,
                    jnp.where(lt == sc.L_POINT,
                              warps.pdf_uniform_sphere(),
                              jnp.where(lt == sc.L_SPOT, pdf_spot, 0.0)))
    return pdf


def pdf_origin(scene: sc.SceneData, lidx):
    """Area density of generate_path's position sample (0 = delta)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    lights = scene.lights
    lt = lights.ltype[lidx]
    s_idx = jnp.clip(lights.prim[lidx], 0, scene.spheres.count - 1)
    inv_a_s = 1.0 / jnp.maximum(_sphere_area(scene, s_idx), 1e-20)
    if scene.n_tris > 0:
        t_idx = jnp.clip(lights.prim[lidx], 0, scene.n_tris - 1)
        inv_a_t = 1.0 / jnp.maximum(
            tri.tri_area(scene.tri_v0[t_idx], scene.tri_v1[t_idx],
                         scene.tri_v2[t_idx]), 1e-20)
    else:
        inv_a_t = jnp.zeros_like(inv_a_s)
    wr = jnp.maximum(lights.params[lidx, 0], 1e-6)
    inv_a_d = 1.0 / (PI * wr * wr)
    return jnp.where(
        lt == sc.L_AREA_SPHERE, inv_a_s,
        jnp.where(lt == sc.L_AREA_TRI, inv_a_t,
                  jnp.where(lt == sc.L_DISTANT, inv_a_d, 0.0)))
