"""Stateless wavefront sampler.

Replaces the reference's mutable per-pixel stratified sampler
(ref: src/sample/strata.rs) with a counter-based hash scheme: every
ray owns a key derived from (seed, pixel_id, sample_id), and each
consumed dimension hashes a static dimension counter with that key.
This makes the whole render a pure function of the seed — the TPU
equivalent of ``set_sample_index`` checkpoint/resume comes for free.

The hash is pcg4d (Jarzynski & Olano, "Hash Functions for GPU
Rendering", JCGT 2020) — the standard production-renderer per-path
RNG.  Unlike the earlier vmapped threefry fold_in chain, pcg4d is a
short branch-free chain of u32 mul/add/xor/shift that XLA fuses into
neighbouring elementwise work: on a wavefront of N rays a draw costs
no extra HBM round trips (the threefry version materialized sliced
key arrays per dimension and dominated the sampler phase).

Camera film positions are stratified over a (dx, dy) sub-pixel grid,
mirroring StrataSampler's per-pixel strata (ref: strata.rs:49-80);
remaining dimensions are independent uniforms, which agrees in
distribution with the shuffled stratified tables of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U = jnp.uint32
# 1/2^24 : uniforms from the top 24 bits, exactly representable in f32
_INV24 = jnp.float32(1.0 / 16777216.0)


def _pcg4d(a, b, c, d):
    """One pcg4d round over four u32 words (arrays or scalars).
    Returns the four mixed words."""
    a = a * _U(1664525) + _U(1013904223)
    b = b * _U(1664525) + _U(1013904223)
    c = c * _U(1664525) + _U(1013904223)
    d = d * _U(1664525) + _U(1013904223)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def make_base_key(seed: int):
    return jax.random.PRNGKey(seed)


def ray_keys(base_key, pixel_id, sample_id):
    """Derive one key per ray from (pixel, sample) ids. Both int32 [N].
    Returns [N, 2] u32 (seed-mixed pixel word, sample word)."""
    base_key = jax.random.key_data(base_key) \
        if jnp.issubdtype(base_key.dtype, jax.dtypes.prng_key) else base_key
    base_key = base_key.astype(_U).reshape(-1)
    k0 = pixel_id.astype(_U) ^ (base_key[-1] * _U(0x9E3779B9)
                                + base_key[0])
    k1 = sample_id.astype(_U)
    return jnp.stack([k0, k1], axis=-1)


def uniform_1d(keys, dim: int):
    """One uniform per ray for static dimension index `dim`."""
    a, _, _, _ = _pcg4d(keys[..., 0], keys[..., 1],
                        jnp.full(keys.shape[:-1], dim, _U),
                        jnp.full(keys.shape[:-1], 0x2545F491, _U))
    return (a >> 8).astype(jnp.float32) * _INV24


def uniform_2d(keys, dim: int):
    """[N, 2] uniforms for dimensions (dim, dim+1)."""
    a, b, _, _ = _pcg4d(keys[..., 0], keys[..., 1],
                        jnp.full(keys.shape[:-1], dim, _U),
                        jnp.full(keys.shape[:-1], 0x2545F491, _U))
    u0 = (a >> 8).astype(jnp.float32) * _INV24
    u1 = (b >> 8).astype(jnp.float32) * _INV24
    return jnp.stack([u0, u1], axis=-1)


def _permute_pow2(i, n: int, seed):
    """Stateless bijective permutation of [0, n) for power-of-two n
    (Kensler, "Correlated Multi-Jittered Sampling", 2013 — the
    cycle-walk collapses to one pass when n is a power of two).
    i: u32 array; seed: u32 array (per-lane permutation key)."""
    w = _U(n - 1)
    i = i & w
    i = i ^ seed
    i = i * _U(0xe170893d)
    i = i ^ (seed >> 16)
    i = i ^ ((i & w) >> 4)
    i = i ^ (seed >> 8)
    i = i * _U(0x0929eb3f)
    i = i ^ (seed >> 23)
    i = i ^ ((i & w) >> 1)
    i = i * (_U(1) | (seed >> 27))
    i = i * _U(0x6935fa69)
    i = i ^ ((i & w) >> 11)
    i = i * _U(0x74dcca23)
    i = i ^ (seed >> 2)
    i = i * _U(0x9e501cc3)
    i = i ^ ((i & w) >> 2)
    i = i * _U(0xc860a3df)
    i = i & w
    i = i ^ (i >> 5)
    return (i + seed) & w


def _dim_seed(keys, dim: int):
    """Per-(pixel, dim) permutation key, decorrelated from the jitter
    stream (different mixing constant)."""
    a, _, _, _ = _pcg4d(keys[..., 0],
                        jnp.full(keys.shape[:-1], dim, _U),
                        jnp.full(keys.shape[:-1], 0x8F1BBCDC, _U),
                        jnp.full(keys.shape[:-1], 0xCA62C1D6, _U))
    return a


def stratified_1d(keys, spp: int, dim: int):
    """Per-pixel stratified 1-D draw: sample s lands in stratum
    permute(s) of spp equal strata, jittered (the counter-based
    equivalent of the reference's pre-stratified per-dim shuffled
    tables, strata.rs:49-80).  Non-power-of-two spp falls back to the
    independent uniform (equal in expectation)."""
    u = uniform_1d(keys, dim)
    if spp < 2 or (spp & (spp - 1)) != 0:
        return u
    stratum = _permute_pow2(keys[..., 1], spp, _dim_seed(keys, dim))
    return (stratum.astype(jnp.float32) + u) / spp


def stratified_2d(keys, dx: int, dy: int, dim: int):
    """Per-pixel stratified 2-D draw over a dx*dy cell grid with a
    per-(pixel, dim) cell shuffle + jitter (strata.rs:167-194
    semantics, stateless).  Falls back to independent uniforms when
    dx*dy is not a power of two."""
    u = uniform_2d(keys, dim)
    spp = dx * dy
    if spp < 2 or (spp & (spp - 1)) != 0 or dx < 1 or dy < 1:
        return u
    cell = _permute_pow2(keys[..., 1], spp, _dim_seed(keys, dim))
    cx = (cell % _U(dx)).astype(jnp.float32)
    cy = (cell // _U(dx)).astype(jnp.float32)
    jx = (cx + u[..., 0]) / dx
    jy = (cy + u[..., 1]) / dy
    return jnp.stack([jx, jy], axis=-1)


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
    kind "uniform": independent uniforms everywhere (the reference's
    Naive sampler, sample/naive.rs — also the control arm of the
    stratification variance gate, tests/test_sampling.py).
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
        if self.kind in ("sobol", "uniform"):
            return self.u2(0)
        return stratified_film_sample(
            self.keys, self.sample_id, self.dx, self.dy, dim=0)
