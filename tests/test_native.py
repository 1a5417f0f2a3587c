"""Native C++ BVH builder: bit-parity with the NumPy builder and
traversal correctness (the two implement the identical binned-SAH
algorithm; see arendur_tpu/native/bvh_builder.cpp)."""

import numpy as np
import pytest

from arendur_tpu import native as nat
from arendur_tpu.accel import bvh as bvhmod


def random_tris(n, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    v0 = c + rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    v1 = c + rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    v2 = c + rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    return v0, v1, v2


@pytest.fixture(scope="module")
def lib():
    if nat.load() is None:
        pytest.skip("no C++ toolchain")
    return nat


class TestNativeBVH:
    def test_bit_parity_with_numpy(self, lib):
        v0, v1, v2 = random_tris(500)
        a = bvhmod.build_bvh(v0, v1, v2, native=True)
        b = bvhmod.build_bvh(v0, v1, v2, native=False)
        np.testing.assert_array_equal(np.asarray(a.order),
                                      np.asarray(b.order))
        np.testing.assert_array_equal(np.asarray(a.second),
                                      np.asarray(b.second))
        np.testing.assert_array_equal(np.asarray(a.start),
                                      np.asarray(b.start))
        np.testing.assert_array_equal(np.asarray(a.count),
                                      np.asarray(b.count))
        np.testing.assert_array_equal(np.asarray(a.axis),
                                      np.asarray(b.axis))
        np.testing.assert_array_equal(np.asarray(a.bmin),
                                      np.asarray(b.bmin))
        np.testing.assert_array_equal(np.asarray(a.bmax),
                                      np.asarray(b.bmax))

    def test_degenerate_centroids(self, lib):
        # identical centroids force the even-split path on both sides
        v0 = np.zeros((16, 3), np.float32)
        v1 = np.tile([1.0, 0, 0], (16, 1)).astype(np.float32)
        v2 = np.tile([0, 1.0, 0], (16, 1)).astype(np.float32)
        a = bvhmod.build_bvh(v0, v1, v2, native=True)
        b = bvhmod.build_bvh(v0, v1, v2, native=False)
        np.testing.assert_array_equal(np.asarray(a.count),
                                      np.asarray(b.count))
        np.testing.assert_array_equal(np.asarray(a.order),
                                      np.asarray(b.order))

    def test_traversal_matches_bruteforce(self, lib):
        import jax.numpy as jnp
        from arendur_tpu.accel.bvh import intersect_bvh
        v0, v1, v2 = random_tris(300, seed=3)
        bvh = bvhmod.build_bvh(v0, v1, v2, native=True)
        rng = np.random.RandomState(7)
        n = 128
        o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tmax = jnp.full((n,), 1e30, jnp.float32)
        t, idx, b0, b1 = intersect_bvh(bvh, v0, v1, v2,
                                       jnp.asarray(o), jnp.asarray(d), tmax)
        # brute force oracle
        from arendur_tpu.shapes.triangle import (
            ray_shear, intersect_watertight_lanewise)
        perm, shear = ray_shear(jnp.asarray(d))
        best_t = np.full(n, 1e30, np.float32)
        best_i = np.full(n, -1, np.int64)
        for k in range(len(v0)):
            hit, tk, _, _ = intersect_watertight_lanewise(
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(best_t),
                perm, shear,
                jnp.tile(v0[k], (n, 1)), jnp.tile(v1[k], (n, 1)),
                jnp.tile(v2[k], (n, 1)))
            hit = np.asarray(hit)
            tk = np.asarray(tk)
            upd = hit & (tk < best_t)
            best_t[upd] = tk[upd]
            best_i[upd] = k
        np.testing.assert_array_equal(np.asarray(idx), best_i)
        np.testing.assert_allclose(np.asarray(t)[best_i >= 0],
                                   best_t[best_i >= 0], rtol=1e-5)
