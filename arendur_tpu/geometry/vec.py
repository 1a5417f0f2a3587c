"""Batched 3-vector helpers over jnp arrays shaped [..., 3].

Replaces the reference's cgmath Vector3f/Point3f scalar math
(ref: src/geometry/foundamental.rs) with SoA-friendly batched ops.
All functions broadcast over leading axes so a "vector" here is a
whole wavefront of vectors.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def vec3(x, y, z, dtype=jnp.float32):
    """Stack three scalars-or-arrays into a [..., 3] vector."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)),
        axis=-1)


def to_f32(a):
    return jnp.asarray(a, jnp.float32)


# NOTE on formulation: on TPU a reduce op ends an XLA fusion, and
# every fusion boundary is an HBM round trip of a [..., 3] array whose
# minor dim is tile-padded to 128 lanes (42x traffic bloat).  Writing
# dot/cross/length as *slice + elementwise* math instead of
# jnp.sum/jnp.cross keeps them fusable into the surrounding
# elementwise work: the profiled PT wave spent ~25% of device time in
# reduce_sum/concatenate fusions rooted at these helpers.

def dot(a, b, keepdims: bool = False):
    if a.shape[-1] == 3 and b.shape[-1] == 3:
        s = (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
             + a[..., 2] * b[..., 2])
        return s[..., None] if keepdims else s
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    if a.shape[-1] == 3 and b.shape[-1] == 3:
        a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
        b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
        return jnp.stack([a1 * b2 - a2 * b1,
                          a2 * b0 - a0 * b2,
                          a0 * b1 - a1 * b0], axis=-1)
    return jnp.cross(a, b)


def length2(a, keepdims: bool = False):
    return dot(a, a, keepdims=keepdims)


def length(a, keepdims: bool = False):
    return jnp.sqrt(length2(a, keepdims=keepdims))


def normalize(a, eps: float = 1e-30):
    """Normalize along the last axis.

    The squared norm is clamped below by `eps` so masked degenerate
    lanes keep *finite* primals — required for NaN-free reverse-mode
    through `jnp.where` (the "double-where" rule).
    """
    n2 = jnp.maximum(length2(a, keepdims=True), eps)
    return a * jnp.sqrt(1.0 / n2)


def distance2(a, b, keepdims: bool = False):
    return length2(a - b, keepdims=keepdims)


def distance(a, b, keepdims: bool = False):
    return length(a - b, keepdims=keepdims)


def lerp(a, b, t):
    return a + (b - a) * t


def max_component(a):
    return jnp.max(a, axis=-1)


def abs_max_axis(a):
    """Index of the component with largest |value| (ref: ray.rs shearing
    transform picks the dominant axis)."""
    return jnp.argmax(jnp.abs(a), axis=-1)


def as_jax(pytree):
    """Convert NumPy leaves to jax constants at trace time (no-op for
    already-traced leaves).  Scene/camera pytrees are built on NumPy so
    jit closures bake them into the executable in one upload; call
    this at function entry before traced-index gathers."""
    import jax as _jax
    import jax.numpy as _jnp
    return _jax.tree_util.tree_map(_jnp.asarray, pytree)
