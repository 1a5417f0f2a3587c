"""MXU-matmul intersector vs the wavefront watertight oracle."""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.shapes import triangle as tri
from arendur_tpu.shapes import mxu_intersect as mxi


def random_scene(n_tris=300, n_rays=512, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-3, 3, (n_tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.8, 0.8, (n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.8, 0.8, (n_tris, 3)).astype(np.float32)
    o = rng.uniform(-5, 5, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return v0, v1, v2, o, d


class TestMXUIntersect:
    def _compare(self, seed, chunk=128):
        v0, v1, v2, o, d = random_scene(seed=seed)
        tmax = np.full(len(o), np.inf, np.float32)
        jj = jnp.asarray
        t_ref, i_ref, b0_ref, b1_ref = tri.intersect_scene_tris(
            jj(o), jj(d), jj(tmax), jj(v0), jj(v1), jj(v2), chunk=64)
        w = mxi.pack_chunks(v0, v1, v2, chunk=chunk)
        t_m, i_m, b0_m, b1_m = mxi.intersect_mxu(
            w, jj(o), jj(d), jj(tmax), len(v0), chunk=chunk)
        i_ref, i_m = np.asarray(i_ref), np.asarray(i_m)
        t_ref, t_m = np.asarray(t_ref), np.asarray(t_m)
        hit_r = i_ref >= 0
        hit_m = i_m >= 0
        # compare t only where both hit: miss lanes hold +inf, and
        # inf - inf would emit a NaN RuntimeWarning
        both = hit_r & hit_m
        dt = np.zeros_like(t_ref)
        dt[both] = np.abs(t_ref[both] - t_m[both])
        disagree = (hit_r != hit_m) | (
            dt > 2e-3 * np.maximum(1.0, np.abs(np.where(both, t_ref, 0.0))))
        assert disagree.mean() < 0.005, disagree.sum()
        same = hit_r & hit_m & (i_ref == i_m)
        # barycentrics agree where the same triangle won
        np.testing.assert_allclose(
            np.asarray(b0_m)[same], np.asarray(b0_ref)[same], atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(b1_m)[same], np.asarray(b1_ref)[same], atol=5e-3)

    def test_vs_watertight_seed0(self):
        self._compare(0)

    def test_vs_watertight_seed1(self):
        self._compare(1, chunk=512)

    def test_tmax(self):
        v0 = np.asarray([[-1, -1, 5.0]], np.float32)
        v1 = np.asarray([[1, -1, 5.0]], np.float32)
        v2 = np.asarray([[0, 1, 5.0]], np.float32)
        o = jnp.zeros((1, 3), jnp.float32)
        d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
        w = mxi.pack_chunks(v0, v1, v2, chunk=8)
        t, i, _, _ = mxi.intersect_mxu(
            w, o, d, jnp.asarray([4.0]), 1, chunk=8)
        assert int(i[0]) == -1
        t, i, _, _ = mxi.intersect_mxu(
            w, o, d, jnp.asarray([6.0]), 1, chunk=8)
        assert int(i[0]) == 0 and abs(float(t[0]) - 5.0) < 1e-3

    def test_occlusion(self):
        v0, v1, v2, o, d = random_scene(seed=3)
        tmax = jnp.full((len(o),), np.inf, jnp.float32)
        w = mxi.pack_chunks(v0, v1, v2, chunk=128)
        blocked = np.asarray(mxi.occluded_mxu(
            w, jnp.asarray(o), jnp.asarray(d), tmax, len(v0), chunk=128))
        _, i_ref, _, _ = tri.intersect_scene_tris(
            jnp.asarray(o), jnp.asarray(d), tmax,
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), chunk=64)
        ref_blocked = np.asarray(i_ref) >= 0
        assert (blocked == ref_blocked).mean() > 0.995
