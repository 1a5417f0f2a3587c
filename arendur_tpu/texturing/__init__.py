"""Textures + mipmaps (ref: src/texturing/)."""

from arendur_tpu.texturing import texture
