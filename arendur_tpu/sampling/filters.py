"""Reconstruction filters (ref: src/sample/filters.rs).

Each filter is described by a small config and evaluated batched on
device at splat time.  ``make_filter`` returns (radius_xy, eval_fn)
where eval_fn maps offsets [..., 2] (in pixels, filter centered at 0)
to weights [...]; points outside the support evaluate to the raw
formula — the film splat only ever evaluates inside the support,
matching the reference's ``evaluate_unsafe`` contract.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp

PI = float(jnp.pi)


@dataclasses.dataclass(frozen=True)
class FilterSpec:
    kind: str = "lanczos"       # box|triangle|gaussian|mitchell|lanczos
    radius: Tuple[float, float] = (4.0, 4.0)
    alpha: float = 2.0          # gaussian
    b: float = 1.0 / 3.0        # mitchell
    c: float = 1.0 / 3.0        # mitchell
    tau: float = 3.0            # lanczos


def _sinc(x):
    xpi = x * PI
    return jnp.where(x < 1e-5, 1.0, jnp.sin(xpi) / jnp.where(x < 1e-5, 1.0, xpi))


def _mitchell_1d(x, b, c):
    # ref: filters.rs mitchell_1d; x in [0, 2]
    inv6 = 1.0 / 6.0
    hi = ((-b - 6.0 * c) * x ** 3 + (6.0 * b + 30.0 * c) * x ** 2
          - (12.0 * b + 48.0 * c) * x + (8.0 * b + 24.0 * c) * inv6)
    lo = ((12.0 - 9.0 * b - 6.0 * c) * x ** 3
          + (-18.0 + 12.0 * b + 6.0 * c) * x ** 2
          + (6.0 - 2.0 * b) * inv6)
    return jnp.where(x > 1.0, hi, lo)


def make_filter(spec: FilterSpec) -> Tuple[Tuple[float, float], Callable]:
    rx, ry = float(spec.radius[0]), float(spec.radius[1])
    kind = spec.kind

    if kind == "box":
        def evaluate(p):
            return jnp.ones(p.shape[:-1], p.dtype)
    elif kind == "triangle":
        def evaluate(p):
            return ((rx - jnp.abs(p[..., 0])) * (ry - jnp.abs(p[..., 1])))
    elif kind == "gaussian":
        na = -float(spec.alpha)
        ex, ey = jnp.exp(na * rx * rx), jnp.exp(na * ry * ry)

        def evaluate(p):
            gx = jnp.maximum(0.0, jnp.exp(na * p[..., 0] ** 2) - ex)
            gy = jnp.maximum(0.0, jnp.exp(na * p[..., 1] ** 2) - ey)
            return gx * gy
    elif kind == "mitchell":
        b, c = float(spec.b), float(spec.c)

        def evaluate(p):
            mx = jnp.abs(2.0 * p[..., 0] / rx)
            my = jnp.abs(2.0 * p[..., 1] / ry)
            return _mitchell_1d(mx, b, c) * _mitchell_1d(my, b, c)
    elif kind == "lanczos":
        inv_tau = 1.0 / float(spec.tau)

        def evaluate(p):
            ax = jnp.abs(p[..., 0])
            ay = jnp.abs(p[..., 1])
            return (_sinc(ax * inv_tau) * _sinc(ax)
                    * _sinc(ay * inv_tau) * _sinc(ay))
    else:
        raise ValueError(f"unknown filter kind {kind!r}")

    return (rx, ry), evaluate


def make_filter_1d(spec: FilterSpec):
    """Separable decomposition: returns ((rx, ry), eval_x, eval_y) with
    evaluate(p) == eval_x(p[...,0]) * eval_y(p[...,1]).

    Every reference filter (filters.rs) is a product of 1D factors;
    the film's dense splat exploits this to evaluate (2p+1) weights
    per axis instead of (2p+1)^2 per tap."""
    rx, ry = float(spec.radius[0]), float(spec.radius[1])
    kind = spec.kind

    if kind == "box":
        fx = fy = lambda x: jnp.ones_like(x)
    elif kind == "triangle":
        fx = lambda x: rx - jnp.abs(x)
        fy = lambda y: ry - jnp.abs(y)
    elif kind == "gaussian":
        na = -float(spec.alpha)
        ex, ey = float(jnp.exp(na * rx * rx)), float(jnp.exp(na * ry * ry))
        fx = lambda x: jnp.maximum(0.0, jnp.exp(na * x * x) - ex)
        fy = lambda y: jnp.maximum(0.0, jnp.exp(na * y * y) - ey)
    elif kind == "mitchell":
        b, c = float(spec.b), float(spec.c)
        fx = lambda x: _mitchell_1d(jnp.abs(2.0 * x / rx), b, c)
        fy = lambda y: _mitchell_1d(jnp.abs(2.0 * y / ry), b, c)
    elif kind == "lanczos":
        inv_tau = 1.0 / float(spec.tau)

        def _l1(x):
            ax = jnp.abs(x)
            return _sinc(ax * inv_tau) * _sinc(ax)
        fx = fy = _l1
    else:
        raise ValueError(f"unknown filter kind {kind!r}")
    return (rx, ry), fx, fy


# The reference film's default filter (ref: film.rs:47-51)
DEFAULT_FILTER = FilterSpec(kind="lanczos", radius=(4.0, 4.0), tau=3.0)
