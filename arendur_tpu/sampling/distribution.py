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


@struct.dataclass
class Distribution2D:
    """Conditional rows + marginal (ref: distribution.rs:163-213).

    Row CDFs are stacked into one [ny, nx+1] array so the device
    sample is two vectorized searchsorteds (no per-row objects)."""
    cond_func: jnp.ndarray      # [ny, nx]
    cond_cdf: jnp.ndarray       # [ny, nx+1]
    cond_int: jnp.ndarray       # [ny]
    marginal: Distribution1D    # over rows

    @property
    def shape(self):
        return self.cond_func.shape


def build_distribution_2d(func) -> Distribution2D:
    """func: [ny, nx] non-negative (e.g. a luminance image)."""
    f = np.asarray(func, np.float32)
    ny, nx = f.shape
    cdf = np.zeros((ny, nx + 1), np.float32)
    cdf[:, 1:] = np.cumsum(f / nx, axis=1)
    func_int = cdf[:, -1].copy()
    uniform = np.arange(nx + 1, dtype=np.float32) / nx
    for y in range(ny):
        if func_int[y] == 0.0:
            cdf[y] = uniform
        else:
            cdf[y] /= func_int[y]
    return Distribution2D(
        cond_func=f, cond_cdf=cdf, cond_int=func_int,
        marginal=build_distribution_1d(func_int))


def sample_continuous_2d(dist: Distribution2D, u2):
    """Sample (x, y) in [0,1)^2 with pdf (ref: distribution.rs:189-204).
    u2: [..., 2]."""
    import jax
    dist = jax.tree_util.tree_map(jnp.asarray, dist)
    ny, nx = dist.cond_func.shape
    y, pdf_y, yi = sample_continuous(dist.marginal, u2[..., 1])
    cdf_row = dist.cond_cdf[yi]                      # [..., nx+1]
    u = u2[..., 0]
    xi = jnp.clip(
        jax.vmap(lambda row, uu: jnp.searchsorted(row, uu, side="right"))(
            cdf_row.reshape(-1, nx + 1), u.reshape(-1)).reshape(u.shape)
        - 1, 0, nx - 1)
    c0 = jnp.take_along_axis(cdf_row, xi[..., None], -1)[..., 0]
    c1 = jnp.take_along_axis(cdf_row, xi[..., None] + 1, -1)[..., 0]
    denom = jnp.where(c1 > c0, c1 - c0, 1.0)
    x = (xi.astype(u.dtype) + (u - c0) / denom) / nx
    fint = dist.cond_int[yi]
    pdf_x = jnp.where(fint > 0.0,
                      dist.cond_func[yi, xi] / jnp.maximum(fint, 1e-20),
                      1.0)
    return jnp.stack([x, y], -1), pdf_x * pdf_y


def pdf_2d(dist: Distribution2D, xy):
    """pdf of sample_continuous_2d at xy (ref: distribution.rs:206-213)."""
    import jax
    dist = jax.tree_util.tree_map(jnp.asarray, dist)
    ny, nx = dist.cond_func.shape
    xi = jnp.clip((xy[..., 0] * nx).astype(jnp.int32), 0, nx - 1)
    yi = jnp.clip((xy[..., 1] * ny).astype(jnp.int32), 0, ny - 1)
    mint = dist.marginal.func_int
    return jnp.where(
        mint > 0.0,
        dist.cond_func[yi, xi] / jnp.maximum(mint, 1e-20),
        1.0)
