"""Sharded rendering and optimization on a virtual 8-device CPU mesh
(SURVEY.md §7 M6: 'CPU-simulated multi-device tests first')."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arendur_tpu import scene as sc
from arendur_tpu import materials as mats
from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm
from arendur_tpu.sampling import filters as filt
from arendur_tpu.render import integrator as integ
from arendur_tpu.parallel import mesh as pmesh


def tiny_scene():
    b = sc.SceneBuilder()
    m = b.add_material(mtype=mats.M_MATTE, kd=(0.6, 0.5, 0.4), sigma=0.0)
    v = np.array([[-10, -10, 0], [10, -10, 0], [10, 10, 0],
                  [-10, 10, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    b.add_mesh(v, f, m)
    b.add_point_light((0, 0, 2.0), (10.0, 10.0, 10.0))
    return b.build()


def tiny_camera(res=8):
    from arendur_tpu.geometry import transform as tf
    pv = np.asarray(tf.look_at([0, 0, 1.0], [0, 0, 0.0], [0, 1, 0.0]))
    return cam.make_perspective(
        parent_view=pv, screen_min=(-1, -1), screen_max=(1, 1),
        znear=0.1, zfar=100.0, fov=1.0, lens=None, resolution=(res, res))


@pytest.fixture(scope="module")
def eight_device_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return pmesh.make_ray_mesh(np.array(jax.devices()[:8]))


class TestShardedRender:
    @pytest.mark.slow
    def test_matches_single_device(self, eight_device_mesh):
        scene = tiny_scene()
        camera = tiny_camera()
        film_cfg = flm.FilmConfig(
            resolution=(8, 8), filter=filt.FilterSpec("box", (0.5, 0.5)))
        config = integ.RenderConfig(max_depth=1, spp=8, sample_dx=4,
                                    sample_dy=2, wave_size=8 * 8 * 8)
        img_single = np.asarray(
            integ.render(scene, camera, film_cfg, config))
        img_sharded = np.asarray(pmesh.render_sharded(
            scene, camera, film_cfg, config, eight_device_mesh))
        # identical rays, identical sampler streams -> near bit-equal
        np.testing.assert_allclose(img_sharded, img_single,
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_train_step_descends(self, eight_device_mesh):
        scene = tiny_scene()
        camera = tiny_camera()
        film_cfg = flm.FilmConfig(
            resolution=(8, 8), filter=filt.FilterSpec("box", (0.5, 0.5)))
        config = integ.RenderConfig(max_depth=1, spp=4, sample_dx=2,
                                    sample_dy=2, wave_size=8 * 8 * 4)
        step = pmesh.sharded_train_step_fn(
            scene, camera, film_cfg, config, eight_device_mesh, lr=0.5)
        # target: darker image than current kd renders
        target = jnp.zeros((64, 3), jnp.float32)
        kd = scene.materials.kd
        ray_idx = jnp.arange(8 * 8 * 4, dtype=jnp.int32)
        losses = []
        for _ in range(3):
            kd, loss = step(kd, target, ray_idx)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        # kd moved toward darker
        assert float(jnp.sum(kd)) < float(jnp.sum(scene.materials.kd))


class TestGradients:
    @pytest.mark.slow
    def test_grad_matches_finite_difference(self):
        """Pixel-gradient vs finite differences through the *same*
        deterministic sample stream (BASELINE.md correctness gate)."""
        scene = tiny_scene()
        camera = tiny_camera(res=4)
        from arendur_tpu.sampling import sampler as smp
        config = integ.RenderConfig(max_depth=1, spp=4, sample_dx=2,
                                    sample_dy=2)
        base_key = smp.make_base_key(0)
        n = 4 * 4 * 4
        ray_idx = jnp.arange(n, dtype=jnp.int32)
        pixel_id = ray_idx // 4
        sample_id = ray_idx % 4
        px = (pixel_id % 4).astype(jnp.float32)
        py = (pixel_id // 4).astype(jnp.float32)
        pixel_xy = jnp.stack([px, py], -1)

        def total_radiance(kd_scalar):
            kd = scene.materials.kd * kd_scalar
            s2 = scene.replace(materials=scene.materials.replace(kd=kd))
            _, L = integ.trace_wave(
                s2, camera, config, pixel_xy, pixel_id, sample_id,
                base_key)
            return jnp.sum(L)

        g = float(jax.grad(total_radiance)(jnp.asarray(1.0)))
        eps = 1e-3
        fd = (float(total_radiance(jnp.asarray(1.0 + eps)))
              - float(total_radiance(jnp.asarray(1.0 - eps)))) / (2 * eps)
        assert np.isfinite(g)
        np.testing.assert_allclose(g, fd, rtol=5e-3)
