"""Cameras and film (ref: src/filming/)."""

from arendur_tpu.filming import camera, film
