"""Stateless wavefront sampler.

Replaces the reference's mutable per-pixel stratified sampler
(ref: src/sample/strata.rs) with a counter-based threefry scheme: every
ray owns a PRNG key derived from (seed, pixel_id, sample_id), and each
consumed dimension folds a static dimension counter into that key.
This makes the whole render a pure function of the seed — the TPU
equivalent of ``set_sample_index`` checkpoint/resume comes for free.

Camera film positions are stratified over a (dx, dy) sub-pixel grid,
mirroring StrataSampler's per-pixel strata (ref: strata.rs:49-80);
remaining dimensions are independent uniforms, which agrees in
distribution with the shuffled stratified tables of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_base_key(seed: int):
    return jax.random.PRNGKey(seed)


def ray_keys(base_key, pixel_id, sample_id):
    """Derive one key per ray from (pixel, sample) ids. Both int32 [N]."""
    fold = jax.vmap(jax.random.fold_in, in_axes=(None, 0))
    keys = fold(base_key, pixel_id.astype(jnp.uint32))
    return jax.vmap(jax.random.fold_in)(keys, sample_id.astype(jnp.uint32))


def uniform_1d(keys, dim: int):
    """One uniform per ray for static dimension index `dim`."""
    sub = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, jnp.uint32(dim))
    return jax.vmap(lambda k: jax.random.uniform(k))(sub)


def uniform_2d(keys, dim: int):
    """[N, 2] uniforms for dimensions (dim, dim+1)."""
    sub = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, jnp.uint32(dim))
    return jax.vmap(lambda k: jax.random.uniform(k, (2,)))(sub)


def stratified_film_sample(keys, sample_id, dx: int, dy: int, dim: int = 0):
    """Stratified sub-pixel offset in [0,1)^2.

    sample_id s maps to stratum ((s % dx), (s // dx) % dy) and jitters
    uniformly inside it (ref: strata.rs:167-194 generates dx*dy strata
    per pixel).
    """
    u = uniform_2d(keys, dim)
    sx = (sample_id % dx).astype(jnp.float32)
    sy = ((sample_id // dx) % dy).astype(jnp.float32)
    jx = (sx + u[..., 0]) / dx
    jy = (sy + u[..., 1]) / dy
    return jnp.stack([jx, jy], axis=-1)


# Static per-bounce dimension layout for the path tracer.  The camera
# consumes dims [0, 4); bounce b consumes DIMS_PER_BOUNCE dims starting
# at BOUNCE_DIM_BASE + b * DIMS_PER_BOUNCE.
CAMERA_DIMS = 4
BOUNCE_DIM_BASE = 4
DIMS_PER_BOUNCE = 8
# offsets inside a bounce's block:
DIM_LIGHT_SELECT = 0
DIM_LIGHT_U = 1       # 2 dims
DIM_SCATTER_U = 3     # 2 dims
DIM_BSDF_U = 5        # 2 dims
DIM_RR = 7


def bounce_dim(bounce: int, offset: int) -> int:
    return BOUNCE_DIM_BASE + bounce * DIMS_PER_BOUNCE + offset


class WaveSampler:
    """Per-wave sample-stream facade over the stateless backends.

    kind "strata": stratified film dims + independent threefry uniforms
    (the reference's StrataSampler in distribution).
    kind "sobol": XOR-scrambled Sobol across all dimensions
    (capability extension; benchmark config 4).
    """

    def __init__(self, base_key, pixel_id, sample_id, kind="strata",
                 sobol_table=None, sample_dx=4, sample_dy=4):
        self.kind = kind
        self.base_key = base_key
        self.pixel_id = pixel_id
        self.sample_id = sample_id
        self.keys = ray_keys(base_key, pixel_id, sample_id)
        self.sobol_table = sobol_table
        self.dx = sample_dx
        self.dy = sample_dy

    def u1(self, dim):
        if self.kind == "sobol":
            from arendur_tpu.sampling.sobol import sobol_uniform
            return sobol_uniform(self.sobol_table, self.base_key,
                                 self.pixel_id, self.sample_id, dim)
        return uniform_1d(self.keys, dim)

    def u2(self, dim):
        if self.kind == "sobol":
            from arendur_tpu.sampling.sobol import sobol_uniform_2d
            return sobol_uniform_2d(self.sobol_table, self.base_key,
                                    self.pixel_id, self.sample_id, dim)
        return uniform_2d(self.keys, dim)

    def film_jitter(self):
        if self.kind == "sobol":
            return self.u2(0)
        return stratified_film_sample(
            self.keys, self.sample_id, self.dx, self.dy, dim=0)
