"""Fused Pallas intersect kernel vs the plain-XLA MXU path.

Runs in Pallas interpreter mode on CPU; both paths share the same
determinant math (pack_chunks weights), so results must agree
essentially exactly.
"""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.shapes import mxu_intersect as mxi
from arendur_tpu.shapes import pallas_intersect as pli
from tests.test_mxu_intersect import random_scene


class TestPallasIntersect:
    def _compare(self, seed, chunk, tmax_val=np.inf, n_rays=512):
        v0, v1, v2, o, d = random_scene(seed=seed, n_rays=n_rays)
        tmax = jnp.full((len(o),), tmax_val, jnp.float32)
        jj = jnp.asarray
        w = mxi.pack_chunks(v0, v1, v2, chunk=chunk)
        t_m, i_m, b0_m, b1_m = mxi.intersect_mxu(
            w, jj(o), jj(d), tmax, len(v0), chunk=chunk)
        t_p, i_p, b0_p, b1_p = pli.intersect_pallas(
            w, jj(o), jj(d), tmax, len(v0), chunk=chunk,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_m))
        hit = np.asarray(i_m) >= 0
        np.testing.assert_allclose(np.asarray(t_p)[hit],
                                   np.asarray(t_m)[hit], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(b0_p)[hit],
                                   np.asarray(b0_m)[hit], atol=1e-5)
        np.testing.assert_allclose(np.asarray(b1_p)[hit],
                                   np.asarray(b1_m)[hit], atol=1e-5)

    def test_matches_mxu_inf_tmax(self):
        self._compare(0, chunk=128)

    def test_matches_mxu_multi_chunk(self):
        self._compare(1, chunk=64)

    def test_matches_mxu_finite_tmax(self):
        self._compare(2, chunk=128, tmax_val=4.0)

    def test_ragged_ray_count(self):
        # n_rays not a multiple of the kernel's ray tile
        self._compare(3, chunk=128, n_rays=300)

    def test_occluded(self):
        v0, v1, v2, o, d = random_scene(seed=4)
        tmax = jnp.full((len(o),), np.inf, jnp.float32)
        w = mxi.pack_chunks(v0, v1, v2, chunk=128)
        jj = jnp.asarray
        b_m = np.asarray(mxi.occluded_mxu(
            w, jj(o), jj(d), tmax, len(v0), chunk=128))
        b_p = np.asarray(pli.occluded_pallas(
            w, jj(o), jj(d), tmax, len(v0), chunk=128, interpret=True))
        np.testing.assert_array_equal(b_p, b_m)
