"""Round-3 perf experiments: scan vs unroll, alive fractions, wave size.

Run: python tools/exp_round3.py
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
from arendur_tpu.sampling import sampler as smp
from arendur_tpu import scene as sc

SPP = 16
RES = (256, 256)


def bench_cfg(scene, camera, film_cfg, config, wave, label, n=3):
    w, h = film_cfg.resolution
    base_key = smp.make_base_key(0)

    @jax.jit
    def run_wave(state, ray_idx):
        pixel_id = ray_idx // SPP
        sample_id = ray_idx % SPP
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pixel_xy = jnp.stack([px, py], -1)
        pfilm, L = integ.trace_wave(
            scene, camera, config, pixel_xy, pixel_id.astype(jnp.int32),
            sample_id.astype(jnp.int32), base_key)
        return flm.film_splat_pixmajor(
            film_cfg, state, pfilm - pixel_xy, L, ray_idx[0] // SPP,
            SPP, mask=ray_idx < w * h * SPP)

    state = flm.film_init(film_cfg, padded=True)
    idx0 = jnp.arange(wave, dtype=jnp.int32)
    t0 = time.perf_counter()
    state = run_wave(state, idx0)
    jax.block_until_ready(state)
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n):
        state = run_wave(state, idx0)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:9.1f} ms  -> {wave/dt:10.0f} paths/s"
          f"  (compile {compile_t:.0f}s)")
    return dt


def alive_fractions(scene, camera, config):
    """Trace one wave, record alive fraction after each bounce."""
    base_key = smp.make_base_key(0)
    wave = 1 << 16
    ray_idx = jnp.arange(wave, dtype=jnp.int32)
    pixel_id = (ray_idx // SPP).astype(jnp.int32)
    sample_id = (ray_idx % SPP).astype(jnp.int32)
    w = RES[0]
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    pixel_xy = jnp.stack([px, py], -1)

    from arendur_tpu import materials as mats
    from arendur_tpu.bxdf import slots as sl
    from arendur_tpu.bxdf.types import ALL, SPECULAR
    from arendur_tpu import spectrum as spec
    from arendur_tpu.geometry.vec import dot
    from arendur_tpu.lighting import nee

    @jax.jit
    def run():
        ws = smp.WaveSampler(base_key, pixel_id, sample_id)
        pfilm = pixel_xy + ws.film_jitter()
        from arendur_tpu.filming import camera as cam
        o, d = cam.generate_rays(camera, pfilm, ws.u2(2))
        n = o.shape[0]
        beta = jnp.ones((n, 3), jnp.float32)
        alive = o[:, 0] == o[:, 0]
        fracs = []
        for bounce in range(config.max_depth):
            dim0 = smp.BOUNCE_DIM_BASE + bounce * smp.DIMS_PER_BOUNCE
            hit = sc.intersect(scene, o, d)
            lane_active = alive & hit.hit
            bsdf = mats.compute_scattering(
                scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
                uv=hit.uv, textures=None, dpdv=hit.dpdv)
            u_bsdf = ws.u2(dim0 + smp.DIM_BSDF_U)
            f, wi, pdf, kind = sl.bsdf_sample(bsdf, -d, u_bsdf, ALL)
            cont = lane_active & ~spec.is_black(f) & (pdf > 0.0)
            new_beta = beta * f * (jnp.abs(dot(wi, bsdf.ns))
                                   / jnp.maximum(pdf, 1e-20))[..., None]
            beta_ok = spec.valid(new_beta)
            beta = jnp.where((cont & beta_ok)[..., None], new_beta, beta)
            alive = lane_active & cont & beta_ok
            o = sc.offset_ray_origin(hit.pos, hit.pos_err, hit.ng, wi)
            degenerate = jnp.sum(wi * wi, -1) < 1e-12
            d = jnp.where(degenerate[..., None],
                          jnp.asarray([0.0, 0.0, 1.0]), wi)
            alive = alive & ~degenerate
            lum = spec.luminance(beta)
            u_rr = ws.u1(dim0 + smp.DIM_RR)
            rr_active = (bounce + 1) >= config.min_depth
            roulette = rr_active & (lum < config.rr_threshold)
            killed = roulette & (u_rr < 0.05)
            alive = alive & ~killed
            fracs.append(jnp.mean(alive.astype(jnp.float32)))
        return jnp.stack(fracs)

    f = np.asarray(run())
    print("alive fraction after bounce:", np.array2string(f, precision=3))
    print("mean over bounces:", f"{f.mean():.3f}",
          " (VPU waste factor ~", f"{1/max(np.concatenate([[1.],f[:-1]]).mean(),1e-3):.2f}x)")


def main():
    print("backend:", jax.default_backend())
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    config = dataclasses.replace(config, max_depth=8, wave_size=1 << 16)

    bench_cfg(scene, camera, film_cfg, config, 1 << 16, "scan, wave 64K")
    cfg_big = dataclasses.replace(config, wave_size=1 << 18)
    bench_cfg(scene, camera, film_cfg, cfg_big, 1 << 18, "scan, wave 256K")
    cfg_u = dataclasses.replace(config, unroll_bounces=True)
    bench_cfg(scene, camera, film_cfg, cfg_u, 1 << 16, "unroll, wave 64K")


if __name__ == "__main__":
    main()
