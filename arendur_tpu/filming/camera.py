"""Projective cameras (ref: src/filming/perspective.rs, ortho.rs,
projective.rs).

Cameras are host-built configs whose matrices are baked into small
jnp arrays; ray generation is a batched transform over [N] film
samples.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from arendur_tpu.geometry import transform as tf
from arendur_tpu.geometry.vec import vec3, normalize
from arendur_tpu.sampling.warps import sample_concentric_disk


@struct.dataclass
class CameraData:
    """Device-side camera constants shared by perspective/ortho."""
    view_parent: jnp.ndarray    # [4,4]
    parent_view: jnp.ndarray    # [4,4]
    raster_view: jnp.ndarray    # [4,4]
    view_screen: jnp.ndarray    # [4,4]
    screen_raster: jnp.ndarray  # [4,4]
    dx: jnp.ndarray             # [3] raster x-step in view space
    dy: jnp.ndarray             # [3]
    lens: jnp.ndarray           # [2] (radius, focal_distance); radius 0 = pinhole
    area: jnp.ndarray           # [] screen area at z=1 (importance norm)
    kind: int = struct.field(pytree_node=False, default=0)  # 0=persp 1=ortho


def _proj_info(view_screen: np.ndarray, screen_min, screen_max,
               resolution) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """raster<->screen<->view matrix set (ref: projective.rs:22-46)."""
    resx, resy = float(resolution[0]), float(resolution[1])
    sxmin, symin = float(screen_min[0]), float(screen_min[1])
    sxmax, symax = float(screen_max[0]), float(screen_max[1])
    scale = np.diag(np.array(
        [(sxmax - sxmin) / resx, (symin - symax) / resy, 1.0, 1.0],
        np.float32))
    translate = np.eye(4, dtype=np.float32)
    translate[3, :3] = [sxmin, symax, 0.0]
    # cgmath from_translation * from_nonuniform_scale: scale then translate
    raster_screen = scale @ translate
    screen_raster = np.linalg.inv(raster_screen)
    raster_view = raster_screen @ np.linalg.inv(view_screen)
    return raster_screen, screen_raster, raster_view


def make_perspective(parent_view, screen_min, screen_max, znear, zfar,
                     fov, lens: Optional[Tuple[float, float]],
                     resolution) -> CameraData:
    """Build a perspective camera (ref: perspective.rs:40-107).

    parent_view: [4,4] world->view in our row-layout storage.
    screen_min/max: screen window; resolution: (resx, resy).
    """
    parent_view = np.asarray(parent_view, np.float32)
    view_parent = np.linalg.inv(parent_view)
    view_screen = np.asarray(
        tf.perspective_matrix(fov, znear, zfar), np.float32)
    raster_screen, screen_raster, raster_view = _proj_info(
        view_screen, screen_min, screen_max, resolution)

    def rv_point(p):
        p = np.asarray(p, np.float32)
        out = p @ raster_view[:3, :3] + raster_view[3, :3]
        w = p @ raster_view[:3, 3] + raster_view[3, 3]
        return out / w

    # screen area at z=1 for importance normalization
    # (ref: perspective.rs:58-66)
    pmin = rv_point([0.0, 0.0, 0.0])
    pmin = pmin / pmin[2]
    pmax = rv_point([float(resolution[0]), float(resolution[1]), 0.0])
    pmax = pmax / pmax[2]
    area = abs((pmax[0] - pmin[0]) * (pmax[1] - pmin[1]))

    # raster-step differentials in view space.  (The reference computes
    # dx as rv(1,0,0) - rv(1,0,0) == 0 — an evident bug, perspective.rs
    # :68-76; we use the intended rv(1,0,0) - rv(0,0,0).)
    origin = rv_point([0.0, 0.0, 0.0])
    dx = rv_point([1.0, 0.0, 0.0]) - origin
    dy = rv_point([0.0, 1.0, 0.0]) - origin

    lens_arr = np.asarray(lens if lens is not None else (0.0, 0.0),
                          np.float32)
    return CameraData(
        view_parent=view_parent, parent_view=parent_view,
        raster_view=raster_view, view_screen=view_screen,
        screen_raster=screen_raster,
        dx=np.asarray(dx, np.float32), dy=np.asarray(dy, np.float32),
        lens=lens_arr, area=np.float32(area), kind=0)


def make_ortho(parent_view, screen_min, screen_max, znear, zfar,
               lens, resolution) -> CameraData:
    """Orthographic camera (ref: src/filming/ortho.rs): view_screen is
    a z-range scale/translate; rays start on the film plane with
    direction +z."""
    parent_view = np.asarray(parent_view, np.float32)
    view_parent = np.linalg.inv(parent_view)
    f, n = float(zfar), float(znear)
    view_screen = np.array(
        [[1.0, 0, 0, 0],
         [0, 1.0, 0, 0],
         [0, 0, 1.0 / (f - n), 0],
         [0, 0, -n / (f - n), 1.0]], np.float32)
    raster_screen, screen_raster, raster_view = _proj_info(
        view_screen, screen_min, screen_max, resolution)
    lens_arr = np.asarray(lens if lens is not None else (0.0, 0.0),
                          np.float32)
    dx = np.asarray([1.0, 0.0, 0.0], np.float32) @ raster_view[:3, :3]
    dy = np.asarray([0.0, 1.0, 0.0], np.float32) @ raster_view[:3, :3]
    return CameraData(
        view_parent=view_parent, parent_view=parent_view,
        raster_view=raster_view, view_screen=view_screen,
        screen_raster=screen_raster,
        dx=np.asarray(dx, np.float32), dy=np.asarray(dy, np.float32),
        lens=lens_arr, area=np.float32(1.0), kind=1)


def generate_rays(cam: CameraData, pfilm, plens):
    """Generate world-space camera rays for film points pfilm [N, 2].

    Returns (origin [N,3], dir [N,3]).  Mirrors
    PerspecCam::generate_path (perspective.rs:271-290) including
    thin-lens depth of field.
    """
    import jax as _jax
    cam = _jax.tree_util.tree_map(jnp.asarray, cam)
    n = pfilm.shape[0]
    pfilm3 = jnp.concatenate(
        [pfilm, jnp.zeros((n, 1), pfilm.dtype)], axis=-1)
    pview = tf.transform_point(cam.raster_view, pfilm3)

    if cam.kind == 0:
        o = jnp.zeros((n, 3), pfilm.dtype)
        d = normalize(pview)
    else:
        # ortho rays start at the raster->view point (including z)
        # and travel +z (ref: ortho.rs:182-185)
        o = pview
        d = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], pfilm.dtype), (n, 3))

    lens_r = cam.lens[0]
    focal = cam.lens[1]

    def with_lens(o, d):
        pl = lens_r * sample_concentric_disk(plens)
        ft = focal / d[..., 2]
        pfocus = o + ft[..., None] * d
        o2 = jnp.concatenate([pl, jnp.zeros((n, 1), pfilm.dtype)], axis=-1)
        return o2, normalize(pfocus - o2)

    o_l, d_l = with_lens(o, d)
    use_lens = lens_r > 0.0
    o = jnp.where(use_lens, o_l, o)
    d = jnp.where(use_lens, d_l, d)

    o_world = tf.transform_point(cam.view_parent, o)
    d_world = tf.transform_vector(cam.view_parent, d)
    return o_world, d_world


def generate_ray_differentials(cam: CameraData, pfilm, plens):
    """Main ray + x/y differential directions (ref: perspective.rs:
    292-320).  Returns (o, d, rxd, ryd) — differentials share the
    origin for the pinhole case, matching the reference."""
    n = pfilm.shape[0]
    o, d = generate_rays(cam, pfilm, plens)
    pfilm3 = jnp.concatenate(
        [pfilm, jnp.zeros((n, 1), pfilm.dtype)], axis=-1)
    pview = tf.transform_point(cam.raster_view, pfilm3)
    rxd = tf.transform_vector(cam.view_parent, normalize(pview + cam.dx))
    ryd = tf.transform_vector(cam.view_parent, normalize(pview + cam.dy))
    return o, d, rxd, ryd
