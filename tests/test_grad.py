"""Multi-bounce and texture-parameter gradient verification
(BASELINE configs 3/5; VERDICT r2 item 5).

* depth-3 Cornell: reverse-mode d(loss)/d(kd table) matches central
  finite differences on the largest-magnitude entries.  Russian
  roulette is disabled (rr_threshold=0) so the detached-sampling
  estimator is a smooth deterministic function of the material
  parameters — with the counter-based sampler both FD evaluations
  share identical paths.
* gradients are finite WITHOUT any isfinite masking (the round-1
  overflow came from Oren-Nayar's unbounded grazing-angle tan term,
  clamped since; parallel/mesh.py no longer masks).
* image-texture texels: gradients flow through the atlas texel pool
  (trilinear lookup), FD-verified on a texel patch, and a short
  SGD descent on the texels reduces an image loss.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from arendur_tpu import scene as sc
from arendur_tpu import materials as mats
from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm
from arendur_tpu.io import scenedesc
from arendur_tpu.sampling import filters as filt
from arendur_tpu.render import integrator as integ
from arendur_tpu.geometry import transform as tf


import pytest

pytestmark = pytest.mark.slow   # heavy renders: excluded from
# the quick gate (pytest -m "not slow"); run the full suite before release

def _render_loss_fn(scene, camera, film_cfg, config):
    w, h = film_cfg.resolution
    total = w * h * config.spp

    def loss_of(scene2):
        ray_idx = jnp.arange(total, dtype=jnp.int32)
        pixel_id = (ray_idx // config.spp).astype(jnp.int32)
        sample_id = (ray_idx % config.spp).astype(jnp.int32)
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pxy = jnp.stack([px, py], -1)
        pfilm, L = integ.trace_wave(
            scene2, camera, config, pxy, pixel_id, sample_id,
            integ.smp.make_base_key(config.seed))
        state = flm.film_init(film_cfg)
        state = flm.film_splat(film_cfg, state, pfilm, L,
                               mask=ray_idx < total)
        img = flm.film_finalize(state, film_cfg)
        return jnp.mean(img)

    return loss_of


class TestCornellDepth3:
    def _setup(self):
        scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
            os.path.join(REPO, "examples/cornellbox/cb.json"),
            spp_override=4, resolution_override=(16, 16))
        config = dataclasses.replace(
            config, max_depth=3, wave_size=16 * 16 * 4,
            rr_threshold=0.0)   # smooth estimator for FD
        return scene, camera, film_cfg, config

    def test_kd_grad_matches_fd_depth3(self):
        scene, camera, film_cfg, config = self._setup()
        loss_of = _render_loss_fn(scene, camera, film_cfg, config)

        @jax.jit
        def loss_kd(kd):
            return loss_of(scene.replace(
                materials=scene.materials.replace(kd=kd)))

        kd0 = jnp.asarray(scene.materials.kd)
        g = np.asarray(jax.jit(jax.grad(loss_kd))(kd0))
        assert np.isfinite(g).all(), "non-finite kd gradient (no mask!)"
        assert np.abs(g).max() > 0.0

        # FD-check the three largest-|g| entries
        flat = np.abs(g).ravel()
        picks = np.argsort(flat)[-3:]
        eps = 5e-3
        for p in picks:
            i, j = divmod(int(p), 3)
            dkd = np.zeros_like(np.asarray(kd0))
            dkd[i, j] = eps
            lp = float(loss_kd(kd0 + dkd))
            lm = float(loss_kd(kd0 - dkd))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=0.08,
                                       atol=1e-5)


def _textured_quad_setup():
    """A camera staring at a textured quad lit by a point light."""
    from PIL import Image
    texpath = "/tmp/arendur_grad_tex.png"
    rng = np.random.RandomState(0)
    img = (rng.uniform(0.25, 0.9, (8, 8, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(texpath)

    b = sc.SceneBuilder()
    tex_id = b.atlas.add_image(
        np.asarray(img, np.float32) / 255.0, wrap=2, gamma=False)  # WRAP_CLAMP
    m = b.add_material(mtype=mats.M_MATTE, kd=(1.0, 1.0, 1.0),
                       sigma=0.0, kd_tex=tex_id)
    v = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                 np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(v, f, m, uvs=uv)
    b.add_point_light((0, 0, 3.0), (20.0, 20.0, 20.0))
    scene = b.build()
    textures = b.build_textures()
    pv = np.asarray(tf.look_at([0, 0, 2.5], [0, 0, 0.0], [0, 1, 0.0]))
    camera = cam.make_perspective(
        parent_view=pv, screen_min=(-1, -1), screen_max=(1, 1),
        znear=0.1, zfar=100.0, fov=1.2, lens=None, resolution=(12, 12))
    film_cfg = flm.FilmConfig(
        resolution=(12, 12), filter=filt.FilterSpec("box", (0.5, 0.5)))
    config = integ.RenderConfig(max_depth=2, spp=4, sample_dx=2,
                                sample_dy=2, wave_size=12 * 12 * 4,
                                rr_threshold=0.0, textures=textures)
    return scene, camera, film_cfg, config, textures


class TestTextureTexelGrads:
    def test_texel_grad_fd_and_descent(self):
        scene, camera, film_cfg, config, textures = _textured_quad_setup()
        w, h = film_cfg.resolution
        total = w * h * config.spp

        def render_with(texels):
            cfg = dataclasses.replace(
                config, textures=textures.replace(texels=texels))
            ray_idx = jnp.arange(total, dtype=jnp.int32)
            pixel_id = (ray_idx // cfg.spp).astype(jnp.int32)
            sample_id = (ray_idx % cfg.spp).astype(jnp.int32)
            px = (pixel_id % w).astype(jnp.float32)
            py = (pixel_id // w).astype(jnp.float32)
            pxy = jnp.stack([px, py], -1)
            pfilm, L = integ.trace_wave(
                scene, camera, cfg, pxy, pixel_id, sample_id,
                integ.smp.make_base_key(cfg.seed))
            state = flm.film_init(film_cfg)
            state = flm.film_splat(film_cfg, state, pfilm, L,
                                   mask=ray_idx < total)
            return flm.film_finalize(state, film_cfg)

        tex0 = jnp.asarray(textures.texels)
        target = jnp.asarray(render_with(tex0 * 0.5))

        @jax.jit
        def loss(texels):
            return jnp.mean((render_with(texels) - target) ** 2)

        g = np.asarray(jax.jit(jax.grad(loss))(tex0))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0.0, "no gradient reaches the texels"

        # FD on the largest-|g| texel component
        p = int(np.abs(g).ravel().argmax())
        i, j = divmod(p, 3)
        eps = 1e-2
        d = np.zeros_like(np.asarray(tex0))
        d[i, j] = eps
        fd = (float(loss(tex0 + d)) - float(loss(tex0 - d))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=0.08, atol=1e-6)

        # short SGD descent on the texel pool reduces the loss
        tex = tex0
        l0 = float(loss(tex))
        grad_fn = jax.jit(jax.grad(loss))
        for _ in range(8):
            tex = tex - 40.0 * grad_fn(tex)
        l1 = float(loss(tex))
        assert l1 < 0.5 * l0, (l0, l1)
