"""Unit tests for the math core vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.geometry import vec, transform, frame


def rand_vecs(n, seed=0, lo=-2.0, hi=2.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)


class TestVec:
    def test_dot_cross(self):
        a, b = rand_vecs(64, 1), rand_vecs(64, 2)
        np.testing.assert_allclose(
            np.asarray(vec.dot(a, b)), np.sum(a * b, -1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(vec.cross(a, b)), np.cross(a, b), rtol=1e-5, atol=1e-6)

    def test_normalize(self):
        a = rand_vecs(64, 3) + 0.1
        n = np.asarray(vec.normalize(a))
        np.testing.assert_allclose(
            np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


class TestTransform:
    def test_point_roundtrip(self):
        rng = np.random.default_rng(0)
        # well-conditioned: rotation * scale + translation
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = (q * np.array([0.5, 1.0, 2.0])).astype(np.float32)
        m[3, :3] = rng.normal(size=3).astype(np.float32)
        m = jnp.asarray(m)
        inv = transform.inverse4(m)
        p = rand_vecs(32, 5)
        p2 = transform.transform_point(inv, transform.transform_point(m, p))
        np.testing.assert_allclose(np.asarray(p2), p, rtol=1e-3, atol=1e-4)

    def test_projective_divide(self):
        # the Cornell-box mesh transform has w-column (0,1,0,1):
        # p' should be (-2x, 2y-1.5, -2z+4)/(y+1)
        m = jnp.asarray(
            [[-2.0, 0.0, 0.0, 0.0],
             [0.0, 2.0, 0.0, 1.0],
             [0.0, 0.0, -2.0, 0.0],
             [0.0, -1.5, 4.0, 1.0]], jnp.float32)
        p = np.array([[1.0, 2.0, 3.0]], np.float32)
        got = np.asarray(transform.transform_point(m, p))[0]
        w = 2.0 + 1.0
        np.testing.assert_allclose(
            got, [(-2.0) / w, (4.0 - 1.5) / w, (-6.0 + 4.0) / w], rtol=1e-6)

    def test_normal_preserves_orthogonality(self):
        m = transform.scale_mat(2.0, 1.0, 0.5)
        # tangent along x on a plane with normal along z
        t = transform.transform_vector(m, jnp.asarray([[1.0, 0.0, 1.0]]))
        n = transform.transform_norm(m, jnp.asarray([[1.0, 0.0, -1.0]]))
        assert abs(float(vec.dot(t, n)[0])) < 1e-6

    def test_look_at(self):
        m = transform.look_at([0, 0, -5.0], [0, 0, 0.0], [0, 1, 0.0])
        # eye maps to origin; forward point maps to +z
        p = transform.transform_point(m, jnp.asarray([[0.0, 0.0, -5.0]]))
        np.testing.assert_allclose(np.asarray(p)[0], 0.0, atol=1e-5)
        q = transform.transform_point(m, jnp.asarray([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(q)[0], [0, 0, 5.0], atol=1e-5)


class TestFrame:
    def test_trig_identities(self):
        w = vec.normalize(jnp.asarray(rand_vecs(128, 7)))
        ct2 = np.asarray(frame.cos2_theta(w))
        st2 = np.asarray(frame.sin2_theta(w))
        np.testing.assert_allclose(ct2 + st2, 1.0, atol=1e-5)
        cp = np.asarray(frame.cos_phi(w))
        sp = np.asarray(frame.sin_phi(w))
        np.testing.assert_allclose(cp * cp + sp * sp, 1.0, atol=1e-4)

    def test_reflect(self):
        wo = vec.normalize(jnp.asarray([[1.0, 0.4, 0.8]]))
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        r = np.asarray(frame.reflect(wo, n))[0]
        woe = np.asarray(wo)[0]
        np.testing.assert_allclose(r, [-woe[0], -woe[1], woe[2]], atol=1e-6)

    def test_refract_tir(self):
        # from inside glass at grazing angle: total internal reflection
        wo = vec.normalize(jnp.asarray([[0.95, 0.0, 0.3]]))
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        _, ok = frame.refract(wo, n, 1.5)
        assert not bool(ok[0])
        # head-on always refracts
        wt, ok = frame.refract(jnp.asarray([[0.0, 0.0, 1.0]]), n, 1.5)
        assert bool(ok[0])
        np.testing.assert_allclose(np.asarray(wt)[0], [0, 0, -1.0], atol=1e-6)

    def test_frame_roundtrip(self):
        n = vec.normalize(jnp.asarray([[0.3, -0.5, 0.8]]))
        t, b = frame.get_basis_from(n)
        v = vec.normalize(jnp.asarray(rand_vecs(16, 9)))
        local = frame.to_local(t, b, n, v)
        back = frame.to_world(t, b, n, local)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


class TestSpectrum:
    def test_luminance(self):
        from arendur_tpu import spectrum
        white = jnp.asarray([[1.0, 1.0, 1.0]])
        np.testing.assert_allclose(
            float(spectrum.luminance(white)[0]), 1.0, atol=1e-2)
        assert bool(spectrum.valid(white)[0])
        bad = jnp.asarray([[1.0, -0.1, float("nan")]])
        assert not bool(spectrum.valid(bad)[0])
        assert float(spectrum.sanitize(bad)[0, 0]) == 0.0
