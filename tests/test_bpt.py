"""Bidirectional path tracer: consistency against the PT integrator
(ref: src/renderer/bpt/ — written but disabled in the reference build;
here it is a first-class renderer)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arendur_tpu import scene as sc
from arendur_tpu import materials as mats
from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm
from arendur_tpu.sampling import filters as filt
from arendur_tpu.render import integrator as integ
from arendur_tpu.render import bpt


pytestmark = pytest.mark.slow   # heavy renders: excluded from
# the quick gate (pytest -m "not slow"); run the full suite before release

def box_scene(emission=(8.0, 8.0, 8.0)):
    """Diffuse floor + small emissive triangle light above it."""
    b = sc.SceneBuilder()
    m = b.add_material(mtype=mats.M_MATTE, kd=(0.7, 0.6, 0.5), sigma=0.0)
    v = np.array([[-4, -4, 0], [4, -4, 0], [4, 4, 0], [-4, 4, 0]],
                 np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    b.add_mesh(v, f, m)
    lm = b.add_material(mtype=mats.M_MATTE, kd=(0.0, 0.0, 0.0), sigma=0.0)
    lv = np.array([[-0.7, -0.7, 3.0], [0.7, -0.7, 3.0], [0.0, 0.7, 3.0]],
                  np.float32)
    lf = np.array([[0, 2, 1]], np.int64)  # faces downward (-z)
    b.add_mesh(lv, lf, lm, emission=emission)
    return b.build()


def simple_camera(res):
    from arendur_tpu.geometry import transform as tf
    pv = np.asarray(tf.look_at([0, -6, 2.0], [0, 0, 0.5], [0, 0, 1.0]))
    return cam.make_perspective(
        parent_view=pv, screen_min=(-1, -0.75), screen_max=(1, 0.75),
        znear=0.1, zfar=100.0, fov=0.9, lens=None,
        resolution=res)


class TestBPT:
    def test_matches_pt_on_diffuse_scene(self):
        res = (16, 12)
        scene = box_scene()
        camera = simple_camera(res)
        film_cfg = flm.FilmConfig(
            resolution=res, filter=filt.FilterSpec("box", (0.5, 0.5)))
        config = integ.RenderConfig(max_depth=3, spp=64, sample_dx=8,
                                    sample_dy=8,
                                    wave_size=res[0] * res[1] * 64)
        img_pt = np.asarray(integ.render(scene, camera, film_cfg, config))
        img_bpt = np.asarray(bpt.render_bpt(scene, camera, film_cfg,
                                            config))
        assert np.isfinite(img_bpt).all()
        assert img_bpt.max() > 0.0, "BPT produced a black image"
        # unbiased estimators of the same integral: mean images agree
        # within Monte-Carlo noise
        m_pt = img_pt.mean()
        m_bpt = img_bpt.mean()
        assert abs(m_bpt - m_pt) < 0.25 * max(m_pt, 1e-6), (m_pt, m_bpt)
        # per-pixel agreement, loose (different estimators/noise)
        bright = img_pt.mean(-1) > np.percentile(img_pt.mean(-1), 50)
        rel = (np.abs(img_bpt - img_pt).mean(-1)[bright]
               / np.maximum(img_pt.mean(-1)[bright], 1e-3))
        assert np.median(rel) < 0.5, float(np.median(rel))

    def test_point_light_bpt_finite(self):
        res = (8, 8)
        b = sc.SceneBuilder()
        m = b.add_material(mtype=mats.M_MATTE, kd=(0.6, 0.6, 0.6),
                           sigma=0.0)
        v = np.array([[-4, -4, 0], [4, -4, 0], [4, 4, 0], [-4, 4, 0]],
                     np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        b.add_mesh(v, f, m)
        b.add_point_light((0, 0, 3.0), (20.0, 20.0, 20.0))
        scene = b.build()
        camera = simple_camera(res)
        film_cfg = flm.FilmConfig(
            resolution=res, filter=filt.FilterSpec("box", (0.5, 0.5)))
        config = integ.RenderConfig(max_depth=2, spp=16, sample_dx=4,
                                    sample_dy=4,
                                    wave_size=res[0] * res[1] * 16)
        img = np.asarray(bpt.render_bpt(scene, camera, film_cfg, config))
        assert np.isfinite(img).all()
        assert img.max() > 0.0
