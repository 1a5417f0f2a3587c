"""Scene I/O: obj/mtl meshes, JSON scene descriptions, images."""

from arendur_tpu.io import objloader, scenedesc
