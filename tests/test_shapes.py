"""Shape intersection vs NumPy Möller-Trumbore / analytic oracles."""

import numpy as np
import jax.numpy as jnp

from arendur_tpu.shapes import triangle as tri
from arendur_tpu.shapes import sphere as sph
from arendur_tpu.geometry import transform as tf


def moller_trumbore(o, d, v0, v1, v2, eps=1e-9):
    """Scalar oracle: returns (hit, t, u, v)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d, e2)
    det = e1 @ p
    if abs(det) < eps:
        return False, np.inf, 0, 0
    inv = 1.0 / det
    tv = o - v0
    u = (tv @ p) * inv
    if u < 0 or u > 1:
        return False, np.inf, 0, 0
    q = np.cross(tv, e1)
    v = (d @ q) * inv
    if v < 0 or u + v > 1:
        return False, np.inf, 0, 0
    t = (e2 @ q) * inv
    if t <= 0:
        return False, np.inf, 0, 0
    return True, t, u, v


class TestTriangle:
    def _random_scene(self, n_rays=256, n_tris=64, seed=0):
        rng = np.random.default_rng(seed)
        v0 = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
        v1 = v0 + rng.uniform(-0.8, 0.8, (n_tris, 3)).astype(np.float32)
        v2 = v0 + rng.uniform(-0.8, 0.8, (n_tris, 3)).astype(np.float32)
        o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
        d = rng.normal(size=(n_rays, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return o, d, v0, v1, v2

    def test_vs_oracle(self):
        o, d, v0, v1, v2 = self._random_scene()
        tmax = np.full(len(o), np.inf, np.float32)
        t, idx, b0, b1 = tri.intersect_scene_tris(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax),
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), chunk=16)
        t = np.asarray(t)
        idx = np.asarray(idx)
        mismatches = 0
        for i in range(len(o)):
            best_t, best_j = np.inf, -1
            for j in range(len(v0)):
                hit, tt, _, _ = moller_trumbore(o[i], d[i], v0[j], v1[j], v2[j])
                if hit and tt < best_t:
                    best_t, best_j = tt, j
            if best_j != idx[i]:
                # tolerate boundary-epsilon disagreements only
                if not (best_j >= 0 and idx[i] >= 0
                        and abs(best_t - t[i]) < 1e-3):
                    mismatches += 1
            elif best_j >= 0:
                assert abs(best_t - t[i]) < 1e-3 * max(1.0, best_t)
        assert mismatches <= 2, f"{mismatches} oracle mismatches"

    def test_watertight_shared_edge(self):
        # quad split into two triangles; rays through the diagonal
        # must hit exactly one of them (no cracks)
        v0 = np.array([[0, 0, 0], [0, 0, 0]], np.float32)
        v1 = np.array([[1, 0, 0], [1, 1, 0]], np.float32)
        v2 = np.array([[1, 1, 0], [0, 1, 0]], np.float32)
        rng = np.random.default_rng(1)
        s = rng.uniform(0.01, 0.99, 512).astype(np.float32)
        o = np.stack([s, s, np.ones_like(s)], -1)  # on the diagonal
        d = np.tile(np.array([0, 0, -1], np.float32), (512, 1))
        tmax = np.full(512, np.inf, np.float32)
        t, idx, _, _ = tri.intersect_scene_tris(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax),
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), chunk=2)
        assert (np.asarray(idx) >= 0).all(), "crack along shared edge"
        np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-5)

    def test_tmax_respected(self):
        v0 = jnp.asarray([[-1, -1, 5.0]], jnp.float32)
        v1 = jnp.asarray([[1, -1, 5.0]], jnp.float32)
        v2 = jnp.asarray([[0, 1, 5.0]], jnp.float32)
        o = jnp.zeros((1, 3), jnp.float32)
        d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
        t, idx, _, _ = tri.intersect_scene_tris(
            o, d, jnp.asarray([4.0], jnp.float32), v0, v1, v2)
        assert int(idx[0]) == -1
        t, idx, _, _ = tri.intersect_scene_tris(
            o, d, jnp.asarray([6.0], jnp.float32), v0, v1, v2)
        assert int(idx[0]) == 0 and abs(float(t[0]) - 5.0) < 1e-4

    def test_occlusion(self):
        v0 = jnp.asarray([[-1, -1, 2.0]], jnp.float32)
        v1 = jnp.asarray([[1, -1, 2.0]], jnp.float32)
        v2 = jnp.asarray([[0, 1, 2.0]], jnp.float32)
        o = jnp.zeros((2, 3), jnp.float32)
        d = jnp.asarray([[0, 0, 1.0], [0, 0, -1.0]], jnp.float32)
        blocked = tri.occluded_tris(
            o, d, jnp.asarray([10.0, 10.0], jnp.float32), v0, v1, v2)
        assert bool(blocked[0]) and not bool(blocked[1])


def make_single_sphere(radius=1.0, zmin=None, zmax=None, phimax=2 * np.pi,
                       translate=(0, 0, 0)):
    zmin = -radius if zmin is None else zmin
    zmax = radius if zmax is None else zmax
    r, zn, zx, tmin, tmax_, pm = sph.make_sphere_params(
        radius, zmin, zmax, phimax)
    o2w = np.eye(4, dtype=np.float32)
    o2w[3, :3] = translate
    w2o = np.linalg.inv(o2w)
    mk = lambda x: jnp.asarray(np.asarray([x], np.float32))
    return sph.SphereSoA(
        o2w=jnp.asarray(o2w[None]), w2o=jnp.asarray(w2o[None]),
        radius=mk(r), zmin=mk(zn), zmax=mk(zx),
        thetamin=mk(tmin), thetamax=mk(tmax_), phimax=mk(pm),
        mat_id=jnp.asarray([0], jnp.int32),
        light_id=jnp.asarray([-1], jnp.int32))


class TestSphere:
    def test_axis_hit(self):
        s = make_single_sphere(radius=1.0, translate=(0, 0, 5))
        o = jnp.asarray([[0, 0, 0.0]], jnp.float32)
        d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
        res = sph.intersect_spheres(s, o, d, jnp.asarray([np.inf], jnp.float32))
        assert bool(res["hit"][0])
        np.testing.assert_allclose(float(res["t"][0]), 4.0, rtol=1e-5)
        pos, ng, uv, dpdu, _dpdv, perr = sph.sphere_hit_info(
            s, res["sphere_idx"], res["p_local"])
        np.testing.assert_allclose(
            np.asarray(pos)[0], [0, 0, 4.0], atol=1e-5)
        # outward geometric normal at the near pole points back at us
        # (atol covers the reference's own pole nudge p.x = 1e-5*r,
        # sphere.rs:236-238)
        np.testing.assert_allclose(
            np.asarray(ng)[0], [0, 0, -1.0], atol=1e-3)

    def test_clipped_z(self):
        s = make_single_sphere(radius=1.0, zmin=-0.5, zmax=0.5,
                               translate=(0, 0, 5))
        # ray hits the clipped north cap region -> front hit rejected,
        # reference rejects entirely (does not try far root)
        o = jnp.asarray([[0, 0, 0.0]], jnp.float32)
        d = sph.normalize(jnp.asarray([[0, 0.99, 5.0]], jnp.float32)) \
            if hasattr(sph, "normalize") else None
        from arendur_tpu.geometry.vec import normalize as nrm
        d = nrm(jnp.asarray([[0.0, 0.9, 5.0]], jnp.float32))
        res = sph.intersect_spheres(s, o, d, jnp.asarray([np.inf], jnp.float32))
        # grazing the top: either rejected or hits within z range
        if bool(res["hit"][0]):
            assert abs(float(res["p_local"][0, 2])) <= 0.5 + 1e-5

    def test_inside_hit(self):
        s = make_single_sphere(radius=2.0)
        o = jnp.asarray([[0, 0, 0.0]], jnp.float32)
        d = jnp.asarray([[1.0, 0, 0]], jnp.float32)
        res = sph.intersect_spheres(s, o, d, jnp.asarray([np.inf], jnp.float32))
        assert bool(res["hit"][0])
        np.testing.assert_allclose(float(res["t"][0]), 2.0, rtol=1e-5)

    def test_random_directional(self):
        # from outside, cos-weighted rays toward sphere: every hit has
        # wo.dot(n) > 0 (mirrors reference randomized test,
        # src/shape/tests.rs:53-78)
        s = make_single_sphere(radius=1.0)
        rng = np.random.default_rng(3)
        n = 512
        o = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))
        target = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
        target[:, 2] = target[:, 2] * 0.2
        d = target - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        res = sph.intersect_spheres(
            s, jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), np.inf, jnp.float32))
        hits = np.asarray(res["hit"])
        assert hits.sum() > 0
        pos, ng, uv, dpdu, _dpdv, _ = sph.sphere_hit_info(
            s, res["sphere_idx"], res["p_local"])
        ng = np.asarray(ng)[hits]
        wo = -d[hits]
        assert (np.sum(ng * wo, -1) > 0).all()
        # uv ranges
        uv = np.asarray(uv)[hits]
        assert (uv >= -1e-4).all() and (uv <= 1.0 + 1e-4).all()
