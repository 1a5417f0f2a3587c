"""Shape intersection and sampling (ref: src/shape/)."""

from arendur_tpu.shapes import triangle, sphere
