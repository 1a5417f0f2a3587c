"""XOR-scrambled Sobol sampling (benchmark config 4; the reference
only ships stratified + naive samplers, so this is a capability
extension in the pbrt spirit).

Host side: scipy generates the base Sobol points for (spp, ndims) as
uint32 fixed-point.  Device side: each (pixel, dim) gets a
Cranley-Patterson XOR scramble derived from a threefry hash, so pixels
decorrelate while keeping the sequence's low discrepancy.  The whole
thing stays a pure function of (seed, pixel, sample, dim) — the same
stateless contract as the stratified sampler.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def build_sobol_table(spp: int, ndims: int) -> np.ndarray:
    """[spp, ndims] uint32 base Sobol points (host, scipy)."""
    from scipy.stats import qmc
    m = int(np.ceil(np.log2(max(spp, 2))))
    eng = qmc.Sobol(d=ndims, scramble=False)
    pts = eng.random_base2(m)[:spp]
    return (pts * (2.0 ** 32)).astype(np.uint64).astype(np.uint32)


def sobol_uniform(table, base_key, pixel_id, sample_id, dim):
    """u in [0,1) for lanes: table [spp,D] uint32; pixel_id/sample_id
    [N]; dim scalar or [N].  XOR-scrambled per (pixel, dim)."""
    table = jnp.asarray(table)
    spp, ndims = table.shape
    d = jnp.broadcast_to(jnp.asarray(dim, jnp.uint32), pixel_id.shape)
    base = table[sample_id % spp, jnp.minimum(d, ndims - 1)]
    # per-(pixel, dim) scramble word
    fold = jax.vmap(jax.random.fold_in, in_axes=(None, 0))
    keys = fold(base_key, pixel_id.astype(jnp.uint32) * jnp.uint32(9781)
                + d * jnp.uint32(6271))
    bits = jax.vmap(
        lambda k: jax.random.bits(k, (), jnp.uint32))(keys)
    scrambled = base ^ bits
    return scrambled.astype(jnp.float32) * (2.0 ** -32)


def sobol_uniform_2d(table, base_key, pixel_id, sample_id, dim):
    u0 = sobol_uniform(table, base_key, pixel_id, sample_id, dim)
    u1 = sobol_uniform(table, base_key, pixel_id, sample_id, dim + 1)
    return jnp.stack([u0, u1], axis=-1)
