"""Lights + next-event estimation (ref: src/lighting/, renderer/scene.rs)."""

from arendur_tpu.lighting import nee
