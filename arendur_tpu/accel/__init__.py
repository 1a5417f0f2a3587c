"""Acceleration structures (ref: src/component/bvh.rs)."""

from arendur_tpu.accel import bvh
