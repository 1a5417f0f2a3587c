"""XOR-scrambled Sobol sampling (benchmark config 4; the reference
only ships stratified + naive samplers, so this is a capability
extension in the pbrt spirit).

Host side: scipy generates the base Sobol points for (spp, ndims) as
uint32 fixed-point.  Device side: each (pixel, dim) gets a
Cranley-Patterson XOR scramble word from the same pcg4d hash the
stratified sampler uses (sampler._pcg4d) — a short branch-free chain
of u32 ops that XLA fuses into neighbouring elementwise work.  The
earlier per-draw vmapped threefry fold_in materialized sliced key
arrays per dimension and cost ~48 ms/wave on the tunneled TPU
(DESIGN.md §9.2); the pcg4d scramble keeps the whole draw fusable.
The sequence stays a pure function of (seed, pixel, sample, dim) —
the same stateless contract as the stratified sampler.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from arendur_tpu.sampling.sampler import _pcg4d, _U


def build_sobol_table(spp: int, ndims: int) -> np.ndarray:
    """[spp, ndims] uint32 base Sobol points (host, scipy)."""
    from scipy.stats import qmc
    m = int(np.ceil(np.log2(max(spp, 2))))
    eng = qmc.Sobol(d=ndims, scramble=False)
    pts = eng.random_base2(m)[:spp]
    return (pts * (2.0 ** 32)).astype(np.uint64).astype(np.uint32)


def _seed_word(base_key):
    base_key = jax.random.key_data(base_key) \
        if jnp.issubdtype(base_key.dtype, jax.dtypes.prng_key) else base_key
    base_key = jnp.asarray(base_key).astype(_U).reshape(-1)
    return base_key[-1] * _U(0x9E3779B9) + base_key[0]


def _scramble_words(base_key, pixel_id, d):
    """Two per-(pixel, dim) scramble words (for dims d and d+1)."""
    k0 = pixel_id.astype(_U) ^ _seed_word(base_key)
    a, b, _, _ = _pcg4d(k0, jnp.broadcast_to(jnp.asarray(d, _U), k0.shape),
                        jnp.full(k0.shape, 0x6A09E667, _U),
                        jnp.full(k0.shape, 0xBB67AE85, _U))
    return a, b


def sobol_uniform(table, base_key, pixel_id, sample_id, dim):
    """u in [0,1) for lanes: table [spp,D] uint32; pixel_id/sample_id
    [N]; dim scalar or [N].  XOR-scrambled per (pixel, dim)."""
    table = jnp.asarray(table)
    spp, ndims = table.shape
    d = jnp.broadcast_to(jnp.asarray(dim, jnp.uint32), pixel_id.shape)
    base = table[sample_id % spp, jnp.minimum(d, ndims - 1)]
    bits, _ = _scramble_words(base_key, pixel_id, d)
    scrambled = base ^ bits
    return scrambled.astype(jnp.float32) * (2.0 ** -32)


def sobol_uniform_2d(table, base_key, pixel_id, sample_id, dim):
    """[N,2] uniforms for dims (dim, dim+1) with ONE hash call and ONE
    packed table gather (each wavefront gather is an HBM round trip)."""
    table = jnp.asarray(table)
    spp, ndims = table.shape
    d = jnp.broadcast_to(jnp.asarray(dim, jnp.uint32), pixel_id.shape)
    d0 = jnp.minimum(d, ndims - 1)
    d1 = jnp.minimum(d + 1, ndims - 1)
    row = table[sample_id % spp]
    # static-dim case folds the column select at compile time
    base0 = jnp.take_along_axis(row, d0[:, None].astype(jnp.int32),
                                axis=1)[:, 0]
    base1 = jnp.take_along_axis(row, d1[:, None].astype(jnp.int32),
                                axis=1)[:, 0]
    b0, b1 = _scramble_words(base_key, pixel_id, d)
    u0 = (base0 ^ b0).astype(jnp.float32) * (2.0 ** -32)
    u1 = (base1 ^ b1).astype(jnp.float32) * (2.0 ** -32)
    return jnp.stack([u0, u1], axis=-1)
