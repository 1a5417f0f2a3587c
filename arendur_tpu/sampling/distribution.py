"""Piecewise-constant 1D/2D distributions (ref: src/sample/distribution.rs).

The CDF is built on the host (scene-load time) with NumPy and sampled
on device with vectorized binary search (``jnp.searchsorted``).  Used
for power-weighted light selection (ref: renderer/scene.rs:44) and,
later, image-texture importance sampling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Distribution1D:
    func: jnp.ndarray      # [n] function values
    cdf: jnp.ndarray       # [n+1] cumulative, cdf[0]=0, cdf[n]=1
    func_int: jnp.ndarray  # [] integral of func over [0,1)

    @property
    def n(self):
        return self.func.shape[0]


def build_distribution_1d(func) -> Distribution1D:
    """Host-side CDF build (ref: distribution.rs:23-56)."""
    f = np.asarray(func, np.float32)
    n = len(f)
    cdf = np.zeros(n + 1, np.float32)
    cdf[1:] = np.cumsum(f / n)
    func_int = cdf[-1]
    if func_int == 0.0:
        # uniform fallback, as the reference does
        cdf = np.arange(n + 1, dtype=np.float32) / n
    else:
        cdf = cdf / func_int
    return Distribution1D(
        func=f, cdf=cdf, func_int=np.float32(func_int))


def sample_discrete(dist: Distribution1D, u):
    """Sample an index; returns (idx, pdf) (ref: distribution.rs:99-118)."""
    import jax
    dist = jax.tree_util.tree_map(jnp.asarray, dist)
    idx = jnp.clip(
        jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, dist.n - 1)
    n = dist.func.shape[0]
    pdf = jnp.where(
        dist.func_int > 0.0,
        jnp.take(dist.func, idx) / (dist.func_int * n),
        1.0 / n)
    return idx, pdf


def sample_continuous(dist: Distribution1D, u):
    """Sample x in [0,1); returns (x, pdf, idx)
    (ref: distribution.rs:61-96)."""
    import jax
    dist = jax.tree_util.tree_map(jnp.asarray, dist)
    idx = jnp.clip(
        jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, dist.n - 1)
    c0 = jnp.take(dist.cdf, idx)
    c1 = jnp.take(dist.cdf, idx + 1)
    denom = jnp.where(c1 > c0, c1 - c0, 1.0)
    du = (u - c0) / denom
    n = dist.func.shape[0]
    x = (idx.astype(u.dtype) + du) / n
    pdf = jnp.where(
        dist.func_int > 0.0, jnp.take(dist.func, idx) / dist.func_int, 1.0)
    return x, pdf, idx


def discrete_pdf(dist: Distribution1D, idx):
    import jax
    dist = jax.tree_util.tree_map(jnp.asarray, dist)
    n = dist.func.shape[0]
    return jnp.where(
        dist.func_int > 0.0,
        jnp.take(dist.func, idx) / (dist.func_int * n),
        1.0 / n)
