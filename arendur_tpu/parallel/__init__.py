"""Multi-device scaling (replaces the reference's rayon tile pool,
ref: pt.rs:163-167, with jax.sharding over a device mesh)."""

from arendur_tpu.parallel import mesh
