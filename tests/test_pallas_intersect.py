"""Cluster-culled Pallas intersector vs the plain-XLA MXU oracle.

Runs in Pallas interpreter mode on CPU.  Both paths share the same
determinant math and the same accept op sequence over the same
cluster-packed weights, so culling must be *exactly* lossless: every
(t, slot) pair must match bit-for-bit (SURVEY §7 M2's "identical
hits" bar; ref: src/component/bvh.rs traversal == naive scan).
"""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.accel.clusters import build_clusters
from arendur_tpu.shapes import mxu_intersect as mxi
from arendur_tpu.shapes import pallas_intersect as pli
from tests.test_mxu_intersect import random_scene


def cluster_tables(v0, v1, v2, K=64):
    tabs = build_clusters(v0, v1, v2, K=K)
    return tabs["w_chunks"], tabs["cbox"], tabs["remap"]


class TestClusterIntersect:
    def _compare(self, seed, K=64, tmax_val=np.inf, n_rays=512,
                 shift=0.0):
        v0, v1, v2, o, d = random_scene(seed=seed, n_rays=n_rays)
        v0, v1, v2, o = (a + shift for a in (v0, v1, v2, o))
        w, cbox, remap = cluster_tables(v0, v1, v2, K=K)
        assert w.shape[0] > 1, "test scene must span several clusters"
        tmax = jnp.full((len(o),), tmax_val, jnp.float32)
        jj = jnp.asarray
        t_m, s_m, _, _ = mxi.intersect_mxu(
            w, jj(o), jj(d), tmax, w.shape[0] * K, chunk=K)
        t_p, s_p = pli.intersect_clusters(
            w, cbox, jj(o), jj(d), tmax, interpret=True)
        # culling never changes the result: exact (t, slot) match
        np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_m))
        hit = np.asarray(s_m) >= 0
        np.testing.assert_array_equal(np.asarray(t_p)[hit],
                                      np.asarray(t_m)[hit])
        # remapped ids are valid original triangle ids
        assert np.all(np.asarray(remap)[np.asarray(s_m)[hit]] >= 0)
        return hit

    def test_matches_mxu_inf_tmax(self):
        hit = self._compare(0)
        assert hit.mean() > 0.1

    def test_matches_mxu_small_clusters(self):
        self._compare(1, K=16)

    def test_matches_mxu_finite_tmax(self):
        self._compare(2, tmax_val=4.0)

    def test_ragged_ray_count(self):
        # n_rays not a multiple of the kernel's ray tile
        self._compare(3, n_rays=300)

    def test_off_origin_scene(self):
        # translated scene (|o| ~ 2e3): the relative t-epsilon must
        # keep hits working far from the origin
        # (ref: triangle.rs:431-451's conservative scheme)
        hit = self._compare(0, shift=2000.0)
        assert hit.mean() > 0.1

    def test_n_alive_skips_tail(self):
        v0, v1, v2, o, d = random_scene(seed=5)
        w, cbox, remap = cluster_tables(v0, v1, v2)
        tmax = jnp.full((len(o),), np.inf, jnp.float32)
        jj = jnp.asarray
        t_all, s_all = pli.intersect_clusters(
            w, cbox, jj(o), jj(d), tmax, interpret=True)
        t_na, s_na = pli.intersect_clusters(
            w, cbox, jj(o), jj(d), tmax, n_alive=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(s_na)[:256],
                                      np.asarray(s_all)[:256])
        assert np.all(np.asarray(s_na)[256:] == -1)

    def test_occluded(self):
        v0, v1, v2, o, d = random_scene(seed=4)
        w, cbox, remap = cluster_tables(v0, v1, v2)
        tmax = jnp.full((len(o),), 6.0, jnp.float32)
        jj = jnp.asarray
        b_m = np.asarray(mxi.occluded_mxu(
            w, jj(o), jj(d), tmax, w.shape[0] * 64, chunk=64))
        b_p = np.asarray(pli.occluded_clusters(
            w, cbox, jj(o), jj(d), tmax, interpret=True))
        np.testing.assert_array_equal(b_p, b_m)
        assert b_m.any()

    def test_occluded_n_alive(self):
        v0, v1, v2, o, d = random_scene(seed=6)
        w, cbox, remap = cluster_tables(v0, v1, v2)
        tmax = jnp.full((len(o),), 6.0, jnp.float32)
        jj = jnp.asarray
        b_all = np.asarray(pli.occluded_clusters(
            w, cbox, jj(o), jj(d), tmax, interpret=True))
        b_na = np.asarray(pli.occluded_clusters(
            w, cbox, jj(o), jj(d), tmax, n_alive=128, interpret=True))
        np.testing.assert_array_equal(b_na[:128], b_all[:128])
        assert not b_na[128:].any()
