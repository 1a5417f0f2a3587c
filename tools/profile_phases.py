"""Phase-level profiling of the Cornell PT hot path on the real chip.

Times each phase of a bounce (intersect / NEE / shade / sampler /
splat) plus the full wave, with block_until_ready around each jitted
piece.  Run:  python tools/profile_phases.py
"""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/arendur_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from arendur_tpu.io import scenedesc
from arendur_tpu.render import integrator as integ
from arendur_tpu.filming import film as flm
from arendur_tpu.filming import camera as cam
from arendur_tpu.sampling import sampler as smp
from arendur_tpu import scene as sc
from arendur_tpu import materials as mats
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import ALL
from arendur_tpu.lighting import nee

WAVE = 1 << 16
SPP = 16
RES = (256, 256)


def timeit(name, fn, *args, n=5, ret_dt=False):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:9.3f} ms")
    return dt if ret_dt else out


def main():
    print("backend:", jax.default_backend(), jax.devices())
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    config = dataclasses.replace(config, max_depth=8, wave_size=WAVE)
    print("n_tris:", scene.tri_v0.shape[0],
          "clusters:", None if scene.tri_cw is None
          else scene.tri_cw.shape)

    w, h = film_cfg.resolution
    base_key = smp.make_base_key(0)
    ray_idx = jnp.arange(WAVE, dtype=jnp.int32)
    pixel_id = (ray_idx // SPP).astype(jnp.int32)
    sample_id = (ray_idx % SPP).astype(jnp.int32)
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    pixel_xy = jnp.stack([px, py], -1)

    # camera rays
    @jax.jit
    def gen_rays():
        ws = smp.WaveSampler(base_key, pixel_id, sample_id)
        pfilm = pixel_xy + ws.film_jitter()
        o, d = cam.generate_rays(camera, pfilm, ws.u2(2))
        return pfilm, o, d
    pfilm, o, d = timeit("camera ray gen (incl. sampler)", gen_rays)

    tmax = jnp.full((WAVE,), jnp.inf, jnp.float32)

    @jax.jit
    def closest(o, d):
        return sc.intersect(scene, o, d)
    hit = timeit("scene.intersect (closest-hit)", closest, o, d)

    @jax.jit
    def anyhit(o, d):
        return sc.occluded(scene, o, d, jnp.full((WAVE,), 10.0))
    timeit("scene.occluded (any-hit)", anyhit, o, d)

    @jax.jit
    def shade(hit, d):
        bsdf = mats.compute_scattering(
            scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
            uv=hit.uv, textures=config.textures, dpdv=hit.dpdv)
        ws = smp.WaveSampler(base_key, pixel_id, sample_id)
        f, wi, pdf, kind = sl.bsdf_sample(bsdf, -d, ws.u2(9), ALL)
        return f, wi, pdf
    timeit("compute_scattering + bsdf_sample", shade, hit, d)

    @jax.jit
    def nee_phase(hit, d):
        bsdf = mats.compute_scattering(
            scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
            uv=hit.uv, textures=config.textures, dpdv=hit.dpdv)
        ws = smp.WaveSampler(base_key, pixel_id, sample_id)
        return nee.uniform_sample_one_light(
            scene, hit, bsdf, -d, ws.u1(4), ws.u2(5))
    timeit("NEE (uniform_sample_one_light)", nee_phase, hit, d)

    @jax.jit
    def sampler_only():
        ws = smp.WaveSampler(base_key, pixel_id, sample_id)
        acc = 0.0
        for b in range(8):
            dim0 = smp.BOUNCE_DIM_BASE + b * smp.DIMS_PER_BOUNCE
            acc = acc + ws.u1(dim0) + ws.u2(dim0 + 1).sum(-1) \
                + ws.u2(dim0 + 3).sum(-1) + ws.u2(dim0 + 5).sum(-1) \
                + ws.u1(dim0 + 7)
        return acc
    timeit("sampler draws x8 bounces (40 dims)", sampler_only)

    state = flm.film_init(film_cfg, padded=True)
    L = jnp.abs(jnp.sin(pfilm[:, :1] * jnp.ones((1, 3))))

    @jax.jit
    def splat(state, jit_, L):
        return flm.film_splat_pixmajor(film_cfg, state, jit_, L,
                                       jnp.int32(0), SPP,
                                       mask=ray_idx < WAVE)
    timeit("film_splat_pixmajor (one wave)", splat, state,
           pfilm - jnp.floor(pfilm), L)

    @jax.jit
    def full_wave(state, ray_idx):
        pixel_id = ray_idx // SPP
        sample_id = ray_idx % SPP
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pxy = jnp.stack([px, py], -1)
        pfilm, L = integ.trace_wave(
            scene, camera, config, pxy, pixel_id.astype(jnp.int32),
            sample_id.astype(jnp.int32), base_key)
        return flm.film_splat_pixmajor(
            film_cfg, state, pfilm - pxy, L, ray_idx[0] // SPP, SPP,
            mask=ray_idx < WAVE)
    dt = timeit("FULL wave (8 bounces + splat)", full_wave, state,
                ray_idx, n=3, ret_dt=True)
    print(f"-> {WAVE / dt:.0f} paths/s at this rate")


if __name__ == "__main__":
    main()
