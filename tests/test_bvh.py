"""BVH build + traversal vs the brute-force oracle
(SURVEY.md §7 M2: 'identical hits vs M1 brute force on random rays')."""

import os

import numpy as np
import jax.numpy as jnp

from arendur_tpu.accel import bvh as bvhmod
from arendur_tpu.shapes import triangle as tri

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def random_tris(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _assert_identical_hits(i_n, i_b, t_n, t_b):
    """Exact-parity assertion (SURVEY M2 'identical hits'): hit masks
    equal; hit distances bit-identical (shared watertight test); the
    winning triangle equal except on exact-t ties (shared edges), where
    either adjacent triangle is a valid closest hit."""
    i_n, i_b = np.asarray(i_n), np.asarray(i_b)
    t_n, t_b = np.asarray(t_n), np.asarray(t_b)
    np.testing.assert_array_equal(i_n >= 0, i_b >= 0, "hit masks differ")
    hit = i_n >= 0
    # identical accepts; t may differ by fma re-association between the
    # [N,C] batch layout and the [N] lane-wise layout (ulp-scale)
    np.testing.assert_allclose(t_n[hit], t_b[hit], rtol=2e-6, atol=0,
                               err_msg="hit t differ beyond ulp noise")
    idx_diff = hit & (i_n != i_b)
    # only (ulp-level) t ties may pick a different equally-close tri
    rel = np.abs(t_n[idx_diff] - t_b[idx_diff]) \
        / np.maximum(np.abs(t_n[idx_diff]), 1e-30)
    assert (rel <= 2e-6).all(), (
        int(idx_diff.sum()), "index disagreement without a t tie")


def random_rays(n, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


class TestBVHBuild:
    def test_structure_invariants(self):
        v0, v1, v2 = random_tris(500)
        b = bvhmod.build_bvh(v0, v1, v2)
        count = np.asarray(b.count)
        start = np.asarray(b.start)
        second = np.asarray(b.second)
        order = np.asarray(b.order)
        assert sorted(order.tolist()) == list(range(500))
        leaves = count > 0
        # every leaf within max_leaf, ranges within bounds
        assert count[leaves].max() <= 4
        assert (start[leaves] + count[leaves] <= 500).all()
        # leaf ranges partition [0, T)
        covered = np.zeros(500, bool)
        for s, c in zip(start[leaves], count[leaves]):
            assert not covered[s:s + c].any()
            covered[s:s + c] = True
        assert covered.all()
        # interior second-child pointers are forward references
        interior = ~leaves
        ids = np.arange(len(count))
        assert (second[interior] > ids[interior]).all()

    def test_bounds_contain_children(self):
        v0, v1, v2 = random_tris(200, seed=3)
        b = bvhmod.build_bvh(v0, v1, v2)
        bmin = np.asarray(b.bmin)
        bmax = np.asarray(b.bmax)
        count = np.asarray(b.count)
        second = np.asarray(b.second)
        for i in range(len(count)):
            if count[i] == 0:
                for child in (i + 1, second[i]):
                    assert (bmin[i] <= bmin[child] + 1e-5).all()
                    assert (bmax[i] >= bmax[child] - 1e-5).all()


class TestBVHTraversal:
    def _check_vs_naive(self, n_tris, n_rays, seed):
        v0, v1, v2 = random_tris(n_tris, seed=seed)
        o, d = random_rays(n_rays, seed=seed + 10)
        tmax = np.full(n_rays, np.inf, np.float32)
        jj = lambda x: jnp.asarray(x)
        t_n, i_n, _, _ = tri.intersect_scene_tris(
            jj(o), jj(d), jj(tmax), jj(v0), jj(v1), jj(v2), chunk=128)
        b = bvhmod.build_bvh(v0, v1, v2)
        t_b, i_b, _, _ = bvhmod.intersect_bvh(
            b, jj(v0), jj(v1), jj(v2), jj(o), jj(d), jj(tmax))
        _assert_identical_hits(i_n, i_b, t_n, t_b)

    def test_small_scene(self):
        self._check_vs_naive(64, 512, 0)

    def test_medium_scene(self):
        self._check_vs_naive(1000, 512, 7)

    def test_cornell_camera_rays(self):
        from arendur_tpu.io import scenedesc
        from arendur_tpu.filming import camera as cam
        scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
            os.path.join(REPO, "examples/cornellbox/cb.json"),
            spp_override=1, resolution_override=(32, 24))
        n = 32 * 24
        px = (jnp.arange(n) % 32).astype(jnp.float32) + 0.5
        py = (jnp.arange(n) // 32).astype(jnp.float32) + 0.5
        pfilm = jnp.stack([px, py], -1)
        o, d = cam.generate_rays(
            camera, pfilm, jnp.full((n, 2), 0.5, jnp.float32))
        tmax = jnp.full((n,), jnp.inf, jnp.float32)
        t_n, i_n, _, _ = tri.intersect_scene_tris(
            o, d, tmax, scene.tri_v0, scene.tri_v1, scene.tri_v2)
        b = bvhmod.build_bvh(scene.tri_v0, scene.tri_v1, scene.tri_v2)
        t_b, i_b, _, _ = bvhmod.intersect_bvh(
            b, scene.tri_v0, scene.tri_v1, scene.tri_v2, o, d, tmax)
        _assert_identical_hits(i_n, i_b, t_n, t_b)
