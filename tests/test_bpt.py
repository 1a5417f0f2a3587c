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


def _wave_energies(scene, res=(16, 12), spp=32, max_depth=3, seed=0):
    """One full BPT wave with per-strategy collection + the matched PT
    wave.  Returns (e_pt, e_bpt_total, class_energy dict with keys
    's0'/'s1'/'s2+'/'t1')."""
    import jax.numpy as jnp
    from arendur_tpu.sampling import sampler as smp
    camera = simple_camera(res)
    film_cfg = flm.FilmConfig(
        resolution=res, filter=filt.FilterSpec("box", (0.5, 0.5)))
    config = integ.RenderConfig(max_depth=max_depth, spp=spp,
                                sample_dx=8, sample_dy=4, seed=seed,
                                wave_size=res[0] * res[1] * spp)
    n = res[0] * res[1] * spp
    ray_idx = jnp.arange(n, dtype=jnp.int32)
    pid = (ray_idx // spp).astype(jnp.int32)
    sid = (ray_idx % spp).astype(jnp.int32)
    px = (pid % res[0]).astype(jnp.float32)
    py = (pid // res[0]).astype(jnp.float32)
    pixel_xy = jnp.stack([px, py], -1)
    base_key = smp.make_base_key(seed)
    collect = {}
    _, L, sp, sL, sv = bpt.trace_wave_bpt(
        scene, camera, config, film_cfg, pixel_xy, pid, sid, base_key,
        collect=collect)
    cls = {"s0": 0.0, "s1": 0.0, "s2+": 0.0, "t1": 0.0}
    for (s, t), (c, _w) in collect.items():
        key = ("s0" if s == 0 else "s1" if s == 1
               else "t1" if t == 1 else "s2+")
        cls[key] += float(np.asarray(c).sum(-1).mean())
    e_splat = float((np.asarray(sL).sum(-1) * np.asarray(sv)).sum() / n)
    # t=1 contributions are film splats; in energy space their mean
    # per-camera-sample contribution is the splat sum over the wave
    _, L_pt = integ.trace_wave(scene, camera, config, pixel_xy, pid,
                               sid, base_key)
    e_pt = float(np.asarray(L_pt).sum(-1).mean())
    e_bpt = float(np.asarray(L).sum(-1).mean()) + e_splat
    return e_pt, e_bpt, cls


def _scene_emitter_in_view():
    """Big emissive wall facing the camera: the s=0 (unidirectional)
    class carries ~all energy."""
    b = sc.SceneBuilder()
    lm = b.add_material(mtype=mats.M_MATTE, kd=(0, 0, 0), sigma=0.0)
    v = np.array([[-3, 1, -1], [3, 1, -1], [3, 1, 4], [-3, 1, 4]],
                 np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    b.add_mesh(v, f, lm, emission=(4.0, 4.0, 4.0))
    return b.build()


def _scene_hidden_light():
    """Floor + back wall; small light near the wall facing AWAY from
    it (out of frustum): the wall is lit only via the floor bounce, so
    surface-surface connections (s>=2) dominate."""
    b = sc.SceneBuilder()
    m = b.add_material(mtype=mats.M_MATTE, kd=(0.75, 0.75, 0.75),
                       sigma=0.0)
    f2 = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    b.add_mesh(np.array([[-4, -4, 0], [4, -4, 0], [4, 4, 0],
                         [-4, 4, 0]], np.float32), f2, m)
    b.add_mesh(np.array([[-4, 3, 0], [4, 3, 0], [4, 3, 6],
                         [-4, 3, 6]], np.float32), f2, m)
    lm = b.add_material(mtype=mats.M_MATTE, kd=(0, 0, 0), sigma=0.0)
    lv = np.array([[-0.6, 2.5, 5.0], [0.6, 2.5, 5.0],
                   [0.0, 2.5, 5.8]], np.float32)
    lf = np.array([[0, 2, 1]], np.int64)
    b.add_mesh(lv, lf, lm, emission=(40.0, 40.0, 40.0))
    return b.build()


class TestStrategyClasses:
    """Per-strategy-class gates (VERDICT r4 item 5): three scenes in
    which different (s,t) classes dominate, each asserting (a) BPT
    total matches PT energy at matched spp, (b) the dominant class's
    measured share, and (c) that DROPPING the class would fail (its
    share exceeds the total-energy gate by a wide margin) — so a
    dropped or double-counted strategy weight fails the suite.
    Calibration shares measured at spp=32, seed=0 (ref:
    /root/reference/src/renderer/bpt/mod.rs:234-328)."""

    def test_s0_dominated(self):
        e_pt, e_bpt, cls = _wave_energies(_scene_emitter_in_view())
        rel = abs(e_bpt - e_pt) / max(e_pt, 1e-9)
        assert rel < 0.02, (e_pt, e_bpt)
        share = cls["s0"] / max(e_bpt, 1e-9)
        assert share > 0.99, cls
        # dropping s0 would lose ~all energy -> trivially fails (a)

    def test_s1_and_t1_balanced(self):
        """box_scene splits ~50/50 between the NEE-like s=1 class and
        the t=1 light-tracing splats (measured 0.53/0.47)."""
        e_pt, e_bpt, cls = _wave_energies(box_scene())
        rel = abs(e_bpt - e_pt) / max(e_pt, 1e-9)
        assert rel < 0.08, (e_pt, e_bpt)
        s1 = cls["s1"] / max(e_bpt, 1e-9)
        t1 = cls["t1"] / max(e_bpt, 1e-9)
        assert 0.35 < s1 < 0.70, cls
        assert 0.30 < t1 < 0.65, cls
        # dropping either class shifts the total by its share (>=30%),
        # far beyond the 8% energy gate:
        assert abs((e_bpt - cls["s1"]) - e_pt) / e_pt > 0.25
        assert abs((e_bpt - cls["t1"]) - e_pt) / e_pt > 0.20

    def test_s2_dominated(self):
        """Hidden-light scene: s>=2 surface-surface connections carry
        the bulk (measured 0.70 share)."""
        e_pt, e_bpt, cls = _wave_energies(_scene_hidden_light())
        rel = abs(e_bpt - e_pt) / max(e_pt, 1e-9)
        assert rel < 0.15, (e_pt, e_bpt)
        share = cls["s2+"] / max(e_bpt, 1e-9)
        assert share > 0.4, cls
        assert abs((e_bpt - cls["s2+"]) - e_pt) / e_pt > 0.3


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
