"""Aux subsystems (SURVEY.md §5): checkpoint/resume round-trip,
named phase profiling, invalid-sample counters."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from arendur_tpu import scene as sc
from arendur_tpu import materials as mats
from arendur_tpu import utils
from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm
from arendur_tpu.sampling import filters as filt
from arendur_tpu.sampling import sampler as smp
from arendur_tpu.render import integrator as integ
from arendur_tpu.geometry import transform as tf

RES = 8
SPP = 4


def _setup():
    b = sc.SceneBuilder()
    m = b.add_material(mtype=mats.M_MATTE, kd=(0.6, 0.5, 0.4))
    v = np.array([[-10, -10, 0], [10, -10, 0], [10, 10, 0],
                  [-10, 10, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    b.add_mesh(v, f, m)
    b.add_point_light((0, 0, 2.0), (10.0, 10.0, 10.0))
    scene = b.build()
    pv = np.asarray(tf.look_at([0, 0, 1.0], [0, 0, 0.0], [0, 1, 0.0]))
    camera = cam.make_perspective(
        parent_view=pv, screen_min=(-1, -1), screen_max=(1, 1),
        znear=0.1, zfar=100.0, fov=1.0, lens=None, resolution=(RES, RES))
    film_cfg = flm.FilmConfig(
        resolution=(RES, RES), filter=filt.FilterSpec("box", (0.5, 0.5)))
    config = integ.RenderConfig(max_depth=2, spp=SPP, sample_dx=2,
                                sample_dy=2,
                                wave_size=RES * RES * SPP // 4)
    return scene, camera, film_cfg, config


@pytest.mark.slow
def test_checkpoint_resume_bit_identical(tmp_path):
    """A render resumed from a mid-render checkpoint reproduces the
    uninterrupted image (counter-based sampler => the film
    accumulators + ray cursor are the complete state; tolerance is a
    few ulp because the manually-accumulated prefix waves run in a
    different executable than render()'s fused wave loop)."""
    scene, camera, film_cfg, config = _setup()
    ref = np.asarray(integ.render(scene, camera, film_cfg, config))

    # manually accumulate the first 2 of 4 waves (the same pixel-major
    # wave partitioning render() uses) and save as a checkpoint
    w, h = film_cfg.resolution
    spp = config.spp
    total = w * h * spp
    wave = config.wave_size
    base_key = smp.make_base_key(config.seed)
    state = flm.film_init(film_cfg, padded=True)
    for i in range(2):
        ray_idx = i * wave + jnp.arange(wave, dtype=jnp.int32)
        pixel_id = (ray_idx // spp).astype(jnp.int32)
        sample_id = (ray_idx % spp).astype(jnp.int32)
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pxy = jnp.stack([px, py], -1)
        pfilm, L = integ.trace_wave(scene, camera, config, pxy,
                                    pixel_id, sample_id, base_key)
        state = flm.film_splat_pixmajor(
            film_cfg, state, pfilm - pxy, L, ray_idx[0] // spp, spp,
            mask=ray_idx < total)
    ckpt = str(tmp_path / "render.ckpt.npz")
    utils.save_checkpoint(ckpt, state, 2 * wave, config.seed,
                          meta={"wave": wave})

    resumed = np.asarray(integ.render(
        scene, camera, film_cfg, config, checkpoint_path=ckpt,
        checkpoint_every=1))
    np.testing.assert_allclose(resumed, ref, rtol=1e-6,
                               atol=1e-7)
    # the final checkpoint records completion
    st, next_ray, seed, meta = utils.load_checkpoint(ckpt)
    assert next_ray == 4 * wave and seed == config.seed


@pytest.mark.slow
def test_phase_totals_and_invalid_counter():
    scene, camera, film_cfg, config = _setup()
    utils.reset_phase_totals()
    img = np.asarray(integ.render(scene, camera, film_cfg, config,
                                  progress=True))
    totals = utils.phase_totals()
    assert "pt rendering" in totals and totals["pt rendering"] > 0.0
    assert "pt add sample" in totals
    assert np.isfinite(img).all()

    # the aux counter reports invalid-radiance lanes
    w, h = film_cfg.resolution
    total = w * h * config.spp
    ray_idx = jnp.arange(total, dtype=jnp.int32)
    pixel_id = (ray_idx // config.spp).astype(jnp.int32)
    sample_id = (ray_idx % config.spp).astype(jnp.int32)
    pxy = jnp.stack([(pixel_id % w).astype(jnp.float32),
                     (pixel_id // w).astype(jnp.float32)], -1)
    _, _, aux = integ.trace_wave(
        scene, camera, config, pxy, pixel_id, sample_id,
        smp.make_base_key(0), return_aux=True)
    assert int(aux["n_invalid"]) == 0
