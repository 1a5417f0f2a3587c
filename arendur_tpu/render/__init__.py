"""Renderers / integrators (ref: src/renderer/)."""

from arendur_tpu.render import integrator
