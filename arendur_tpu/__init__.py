"""arendur_tpu — a TPU-native differentiable physically-based renderer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``arendur`` CPU path tracer (reference: DaseinPhaos/arendur).  The
design is wavefront structure-of-arrays: megabatches of rays live in
HBM, every stage (camera ray generation, BVH traversal, shape
intersection, BSDF evaluation/sampling, next-event estimation, film
reconstruction) is a batched, jit-compiled transform over those
arrays, and multi-chip scaling is expressed with `jax.sharding` over a
device mesh rather than threads.

Layer map (mirrors reference src/ layout, see SURVEY.md §1):

- :mod:`arendur_tpu.geometry`   — vectors, transforms, rays, bboxes, frames
- :mod:`arendur_tpu.spectrum`   — RGB spectrum ops (ref: src/spectrum/)
- :mod:`arendur_tpu.sampling`   — samplers, warps, distributions, filters
- :mod:`arendur_tpu.shapes`     — sphere + triangle intersection (ref: src/shape/)
- :mod:`arendur_tpu.accel`      — BVH build + traversal (ref: src/component/bvh.rs)
- :mod:`arendur_tpu.bxdf`       — BxDF models + BSDF mixtures (ref: src/bxdf/, src/material/)
- :mod:`arendur_tpu.texturing`  — textures and mipmaps (ref: src/texturing/)
- :mod:`arendur_tpu.lighting`   — lights + NEE (ref: src/lighting/)
- :mod:`arendur_tpu.filming`    — cameras + film (ref: src/filming/)
- :mod:`arendur_tpu.render`     — integrators (ref: src/renderer/)
- :mod:`arendur_tpu.parallel`   — mesh / shard_map scaling (replaces rayon tiles)
- :mod:`arendur_tpu.io`         — obj/mtl + JSON scene description + PNG
"""

__version__ = "0.1.0"
