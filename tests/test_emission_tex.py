"""Textured emission profiles on area lights
(ref: component/shape.rs:91-130, shape/triangle.rs:541-626: the
emission profile is a texture evaluated at the hit/sample point).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from arendur_tpu import scene as sc
from arendur_tpu.lighting import nee
from arendur_tpu.lighting import emission as emi
from arendur_tpu import materials as mats
from arendur_tpu.bxdf import slots as sl


def _quad_scene():
    """An emissive quad in z=2 plane (u in [0,1] maps x in [0,1]) with
    a left-bright/right-dark profile texture, plus a diffuse floor."""
    b = sc.SceneBuilder()
    m_diff = b.add_material(mtype=mats.M_MATTE, kd=(0.8, 0.8, 0.8))
    # profile: left half (u < 0.5) white, right half black
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4, :] = 1.0
    tex = b.atlas.add_image(img)
    quad_v = np.asarray([[0, 0, 2], [1, 0, 2], [1, 1, 2], [0, 1, 2]],
                        np.float32)
    # wound so the geometric normal points -z (toward the floor)
    quad_f = np.asarray([[0, 2, 1], [0, 3, 2]])
    quad_uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(quad_v, quad_f, m_diff, uvs=quad_uv,
               emission=(4.0, 4.0, 4.0), emission_tex=tex,
               emission_tex_mean=float(img.mean()))
    # floor at z=0 (normal +z)
    floor_v = np.asarray(
        [[-4, -4, 0], [5, -4, 0], [5, 5, 0], [-4, 5, 0]], np.float32)
    b.add_mesh(floor_v, np.asarray([[0, 1, 2], [0, 2, 3]]), m_diff)
    scene = b.build()
    textures = b.build_textures()
    return scene, textures


class TestEmissionTexture:
    def test_light_emission_varies_with_uv(self):
        scene, textures = _quad_scene()
        lidx = jnp.zeros((2,), jnp.int32)
        uv = jnp.asarray([[0.25, 0.5], [0.75, 0.5]], jnp.float32)
        le = np.asarray(sc.light_emission(scene.lights, lidx, uv,
                                          textures))
        assert le[0, 0] > 3.5          # bright half: 4.0 * ~1
        assert le[1, 0] < 0.5          # dark half: 4.0 * ~0

    def test_nee_sees_profile(self):
        scene, textures = _quad_scene()
        n = 256
        # shading point on the floor below the quad
        pos = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32),
                       (n, 1))
        hit = sc.Hit(
            hit=jnp.ones((n,), bool),
            t=jnp.ones((n,)), prim=jnp.zeros((n,), jnp.int32) + 2,
            pos=pos, pos_err=jnp.zeros((n, 3)),
            ng=jnp.tile(jnp.asarray([[0., 0., 1.]]), (n, 1)),
            ns=jnp.tile(jnp.asarray([[0., 0., 1.]]), (n, 1)),
            dpdu=jnp.tile(jnp.asarray([[1., 0., 0.]]), (n, 1)),
            dpdv=jnp.tile(jnp.asarray([[0., 1., 0.]]), (n, 1)),
            uv=jnp.zeros((n, 2)),
            mat_id=jnp.zeros((n,), jnp.int32),
            light_id=jnp.full((n,), -1, jnp.int32))
        bsdf = mats.compute_scattering(
            scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
            uv=hit.uv, textures=None, dpdv=hit.dpdv)
        wo = jnp.tile(jnp.asarray([[0., 0., 1.]]), (n, 1))
        rng = np.random.default_rng(0)
        u_sel = jnp.asarray(rng.uniform(size=n).astype(np.float32))
        u_l = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        direct_tex, _, _ = nee.uniform_sample_one_light(
            scene, hit, bsdf, wo, u_sel, u_l, textures=textures)
        direct_const, _, _ = nee.uniform_sample_one_light(
            scene, hit, bsdf, wo, u_sel, u_l, textures=None)
        m_tex = float(jnp.mean(direct_tex))
        m_const = float(jnp.mean(direct_const))
        # the profile zeroes half the quad: mean NEE radiance drops to
        # about half the constant-profile value
        assert 0.3 * m_const < m_tex < 0.75 * m_const
        assert m_tex > 0.0

    def test_generate_path_sees_profile(self):
        scene, textures = _quad_scene()
        n = 512
        rng = np.random.default_rng(1)
        lidx = jnp.asarray((rng.integers(0, 2, n)).astype(np.int32))
        u_pos = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        u_dir = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
        gp_tex = emi.generate_path(scene, lidx, u_pos, u_dir,
                                   textures=textures)
        gp_const = emi.generate_path(scene, lidx, u_pos, u_dir)
        le_t = np.asarray(gp_tex["le"])
        le_c = np.asarray(gp_const["le"])
        x = np.asarray(gp_tex["pos"])[:, 0]
        # bands away from the u=0.5 bilinear seam AND the u=0/1 wrap
        # seam (REPEAT blends texel 0 with the black right edge)
        bright = (x > 0.15) & (x < 0.4)
        dark = (x > 0.6) & (x < 0.85)
        # bright-half samples keep the constant radiance, dark-half
        # samples are (nearly) black
        assert bright.any() and dark.any()
        assert np.all(le_t[bright, 0] > 3.0)
        assert np.all(le_t[dark, 0] < 1.0)
        assert np.all(le_c[:, 0] > 3.0)

    @pytest.mark.slow
    def test_pt_render_varies(self):
        """End-to-end: a camera looking at the quad sees the profile."""
        from arendur_tpu.render import integrator as integ
        from arendur_tpu.filming import camera as cam
        from arendur_tpu.filming import film as flm
        from arendur_tpu.sampling import sampler as smp
        import jax

        scene, textures = _quad_scene()
        res = (32, 32)
        camera = cam.make_perspective(
            parent_view=np.asarray(
                [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
                 [0.5, 0.5, 0.0, 1]], np.float32),
            screen_min=(-1, -1), screen_max=(1, 1), znear=0.1,
            zfar=100.0, fov=1.0, lens=None, resolution=res)
        config = integ.RenderConfig(max_depth=1, spp=4, sample_dx=2,
                                    sample_dy=2, textures=textures,
                                    wave_size=res[0] * res[1] * 4)
        film_cfg = flm.FilmConfig(resolution=res)
        img = np.asarray(integ.render(scene, camera, film_cfg, config))
        # raster x runs opposite world x here; the profile must split
        # the image into a bright and a (much) darker half
        left = img[:, :10].mean()
        right = img[:, -10:].mean()
        lo, hi = sorted([left, right])
        assert hi > 4.0 * lo + 0.1, (left, right)
