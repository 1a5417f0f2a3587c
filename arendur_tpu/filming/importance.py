"""Camera importance transport — the light-tracing (adjoint) side of
the perspective camera, needed by BPT's t=1 strategies.

Wavefront re-derivation of PerspecCam::evaluate_importance
(ref: src/filming/perspective.rs:332-365), evaluate_importance_sampled
(perspective.rs:367-401) and Camera::pdf (perspective.rs:403-434):

  We(p, w) = 1 / (A * lensArea * cos^4 theta)   if w maps into the
             raster window (A = screen area at z=1), else 0;
  pdf_pos  = 1 / lensArea (delta for a pinhole -> treated as 1);
  pdf_dir  = 1 / (A * cos^3 theta).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arendur_tpu.geometry import transform as tf
from arendur_tpu.geometry.vec import dot, normalize, length2
from arendur_tpu.filming.camera import CameraData
from arendur_tpu.sampling.warps import sample_concentric_disk

PI = float(jnp.pi)


def _as_jax(cam: CameraData) -> CameraData:
    return jax.tree_util.tree_map(jnp.asarray, cam)


def _lens_area(cam: CameraData):
    r = cam.lens[0]
    return jnp.where(r > 0.0, PI * r * r, 1.0)


def _raster_of(cam: CameraData, pview, dview, resolution):
    """Project a view-space ray onto the raster plane; returns
    (praster [N,2], inside [N], cos_theta [N])."""
    cos_t = dview[..., 2]
    focal = cam.lens[1]
    ft = jnp.where(cam.lens[0] > 0.0,
                   focal / jnp.where(cos_t != 0.0, cos_t, 1.0),
                   1.0 / jnp.where(cos_t != 0.0, cos_t, 1.0))
    pfocus = pview + ft[..., None] * dview
    view_raster = jnp.linalg.inv(cam.raster_view)
    praster3 = tf.transform_point(view_raster, pfocus)
    px, py = praster3[..., 0], praster3[..., 1]
    resx, resy = float(resolution[0]), float(resolution[1])
    inside = ((cos_t > 0.0) & (px >= 0.0) & (px < resx)
              & (py >= 0.0) & (py < resy))
    return jnp.stack([px, py], -1), inside, cos_t


def importance_eval(cam: CameraData, p, w, resolution):
    """We and raster position for world rays (p [N,3], w [N,3] unit,
    pointing away from the camera).  Returns (we [N], praster [N,2],
    valid [N])."""
    cam = _as_jax(cam)
    pview = tf.transform_point(cam.parent_view, p)
    dview = normalize(tf.transform_vector(cam.parent_view, w))
    praster, inside, cos_t = _raster_of(cam, pview, dview, resolution)
    cos2 = cos_t * cos_t
    we = 1.0 / jnp.maximum(cam.area * _lens_area(cam) * cos2 * cos2,
                           1e-20)
    return jnp.where(inside, we, 0.0), praster, inside


def importance_sample(cam: CameraData, pos, u2, resolution):
    """Sample a lens point visible from world `pos` [N,3]
    (ref: perspective.rs:367-401).  Returns dict(we [N], praster [N,2],
    pdf [N] solid-angle at pos, pcam [N,3] lens point world, wi [N,3]
    pos->camera unit)."""
    cam = _as_jax(cam)
    n = pos.shape[0]
    plens2 = cam.lens[0] * sample_concentric_disk(u2)
    plens_view = jnp.concatenate(
        [plens2, jnp.zeros((n, 1), jnp.float32)], -1)
    pcam = tf.transform_point(cam.view_parent, plens_view)
    seg = pcam - pos
    d2 = length2(seg)
    wi = seg * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))[..., None]
    # cos at the lens w.r.t. the camera forward axis
    fwd = normalize(tf.transform_vector(
        cam.view_parent,
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                         (n, 3))))
    cos_t = dot(-wi, fwd)
    # pdf of the lens-area sample converted to solid angle at pos
    pdf = d2 / (jnp.maximum(cos_t, 1e-20) * _lens_area(cam))
    we, praster, valid = importance_eval(cam, pcam, -wi, resolution)
    pdf = jnp.where(valid & (cos_t > 0.0), pdf, 0.0)
    return dict(we=we, praster=praster, pdf=pdf, pcam=pcam, wi=wi,
                valid=valid & (cos_t > 0.0))


def importance_pdf(cam: CameraData, p, w, resolution):
    """(pdf_pos, pdf_dir) of generate_path having produced ray (p, w)
    (ref: perspective.rs:403-434)."""
    cam = _as_jax(cam)
    pview = tf.transform_point(cam.parent_view, p)
    dview = normalize(tf.transform_vector(cam.parent_view, w))
    _, inside, cos_t = _raster_of(cam, pview, dview, resolution)
    pdf_pos = jnp.where(inside, 1.0 / _lens_area(cam), 0.0)
    cos3 = jnp.maximum(cos_t, 1e-20) ** 3
    pdf_dir = jnp.where(inside, 1.0 / (cam.area * cos3), 0.0)
    return pdf_pos, pdf_dir
