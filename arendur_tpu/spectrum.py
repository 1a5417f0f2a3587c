"""RGB spectrum ops (ref: src/spectrum/mod.rs).

Spectra are [..., 3] jnp arrays; the reference's RGBSpectrumf is an
sRGB-primaries triple (``to_srgb`` is the identity, mod.rs:339-342).
"""

from __future__ import annotations

import jax.numpy as jnp

# sRGB <-> XYZ matrices (ref: spectrum/mod.rs:279-294)
_RGB_TO_XYZ = jnp.asarray(
    [[0.412453, 0.212671, 0.019334],
     [0.357580, 0.715160, 0.119193],
     [0.180423, 0.072169, 0.950227]], jnp.float32)

_XYZ_TO_RGB = jnp.asarray(
    [[3.240479, -0.969256, 0.055648],
     [-1.537150, 1.875991, -0.204043],
     [-0.498535, 0.041556, 1.057311]], jnp.float32)


def black(shape=(), dtype=jnp.float32):
    return jnp.zeros(shape + (3,), dtype)


def grey(value, dtype=jnp.float32):
    v = jnp.asarray(value, dtype)
    return jnp.broadcast_to(v[..., None], v.shape + (3,))


def to_xyz(rgb):
    return rgb @ _RGB_TO_XYZ


def from_xyz(xyz):
    return xyz @ _XYZ_TO_RGB


def luminance(rgb):
    """The Y of XYZ — used for light power weighting and Russian
    roulette (ref: scene.rs:39, pt.rs:118).  Written elementwise (not
    via the to_xyz matmul) so it fuses on TPU."""
    return (0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1]
            + 0.072169 * rgb[..., 2])


def is_black(rgb):
    # elementwise & instead of jnp.all: a reduce op ends an XLA fusion
    return (rgb[..., 0] == 0.0) & (rgb[..., 1] == 0.0) \
        & (rgb[..., 2] == 0.0)


def valid(rgb):
    """NaN/inf/negative check (ref: spectrum/mod.rs:303-307)."""
    ok = jnp.isfinite(rgb) & (rgb >= 0.0)
    return ok[..., 0] & ok[..., 1] & ok[..., 2]


def sanitize(rgb):
    """Replace invalid samples with black (the PT renderer drops
    invalid radiance, ref: pt.rs:152-156)."""
    return jnp.where(valid(rgb)[..., None], rgb, 0.0)
