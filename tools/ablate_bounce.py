"""Cumulative ablation of the PT bounce loop: times 8-bounce loops with
phases added one at a time, to localize per-bounce cost that the
isolated phase timings (profile_phases.py) do not account for.

Run: python tools/ablate_bounce.py
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
from arendur_tpu.filming import camera as cam
from arendur_tpu.sampling import sampler as smp
from arendur_tpu import scene as sc
from arendur_tpu import materials as mats
from arendur_tpu import spectrum as spec
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import ALL, ALL_NON_SPECULAR, SPECULAR
from arendur_tpu.geometry.vec import dot
from arendur_tpu.lighting import nee

WAVE = 1 << 16
SPP = 16
RES = (256, 256)
DEPTH = 8


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:9.1f} ms   {WAVE/dt:9.0f} paths/s")
    return dt


def main():
    print("backend:", jax.default_backend())
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    scene = jax.tree.map(jnp.asarray, scene)

    base_key = smp.make_base_key(0)
    ray_idx = jnp.arange(WAVE, dtype=jnp.int32)
    pixel_id = (ray_idx // SPP).astype(jnp.int32)
    sample_id = (ray_idx % SPP).astype(jnp.int32)
    w = RES[0]
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    pixel_xy = jnp.stack([px, py], -1)

    def start():
        ws = smp.WaveSampler(base_key, pixel_id, sample_id)
        pfilm = pixel_xy + ws.film_jitter()
        o, d = cam.generate_rays(camera, pfilm, ws.u2(2))
        return ws, o, d

    # ---- level 0: intersect-only loop --------------------------------
    @jax.jit
    def lvl_intersect():
        ws, o, d = start()
        acc = jnp.zeros((WAVE,), jnp.float32)
        for b in range(DEPTH):
            hit = sc.intersect(scene, o, d)
            o = hit.pos + hit.ng * 1e-3
            d = jnp.where(hit.hit[:, None], -d, d)
            acc = acc + hit.t * 0.0
        return acc
    timeit("intersect x8", lvl_intersect)

    # ---- level 1: + shade + bsdf sample + beta -----------------------
    @jax.jit
    def lvl_shade():
        ws, o, d = start()
        beta = jnp.ones((WAVE, 3), jnp.float32)
        alive = o[:, 0] == o[:, 0]
        for b in range(DEPTH):
            dim0 = smp.BOUNCE_DIM_BASE + b * smp.DIMS_PER_BOUNCE
            hit = sc.intersect(scene, o, d)
            lane_active = alive & hit.hit
            bsdf = mats.compute_scattering(
                scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
                uv=hit.uv, textures=None, dpdv=hit.dpdv)
            f, wi, pdf, kind = sl.bsdf_sample(
                bsdf, -d, ws.u2(dim0 + smp.DIM_BSDF_U), ALL)
            cont = lane_active & ~spec.is_black(f) & (pdf > 0.0)
            nb = beta * f * (jnp.abs(dot(wi, bsdf.ns))
                             / jnp.maximum(pdf, 1e-20))[..., None]
            beta = jnp.where((cont & spec.valid(nb))[..., None], nb, beta)
            alive = cont & spec.valid(nb)
            o = sc.offset_ray_origin(hit.pos, hit.pos_err, hit.ng, wi)
            d = jnp.where((jnp.sum(wi * wi, -1) < 1e-12)[:, None],
                          jnp.asarray([0., 0., 1.]), wi)
        return beta
    timeit("+ shade/bsdf-sample/beta", lvl_shade)

    # ---- level 2: + NEE ---------------------------------------------
    @jax.jit
    def lvl_nee():
        ws, o, d = start()
        beta = jnp.ones((WAVE, 3), jnp.float32)
        L = jnp.zeros((WAVE, 3), jnp.float32)
        alive = o[:, 0] == o[:, 0]
        for b in range(DEPTH):
            dim0 = smp.BOUNCE_DIM_BASE + b * smp.DIMS_PER_BOUNCE
            hit = sc.intersect(scene, o, d)
            lane_active = alive & hit.hit
            bsdf = mats.compute_scattering(
                scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
                uv=hit.uv, textures=None, dpdv=hit.dpdv)
            do_nee = lane_active & (sl.match_count(bsdf, ALL_NON_SPECULAR) > 0)
            direct, lidx, selpdf = nee.uniform_sample_one_light(
                scene, hit, bsdf, -d, ws.u1(dim0 + smp.DIM_LIGHT_SELECT),
                ws.u2(dim0 + smp.DIM_LIGHT_U))
            L = L + jnp.where(do_nee[..., None], beta * direct, 0.0)
            f, wi, pdf, kind = sl.bsdf_sample(
                bsdf, -d, ws.u2(dim0 + smp.DIM_BSDF_U), ALL)
            cont = lane_active & ~spec.is_black(f) & (pdf > 0.0)
            nb = beta * f * (jnp.abs(dot(wi, bsdf.ns))
                             / jnp.maximum(pdf, 1e-20))[..., None]
            beta = jnp.where((cont & spec.valid(nb))[..., None], nb, beta)
            alive = cont & spec.valid(nb)
            o = sc.offset_ray_origin(hit.pos, hit.pos_err, hit.ng, wi)
            d = jnp.where((jnp.sum(wi * wi, -1) < 1e-12)[:, None],
                          jnp.asarray([0., 0., 1.]), wi)
        return L
    timeit("+ NEE", lvl_nee)

    # ---- level 3: + mis weight + emission ----------------------------
    @jax.jit
    def lvl_mis():
        ws, o, d = start()
        beta = jnp.ones((WAVE, 3), jnp.float32)
        L = jnp.zeros((WAVE, 3), jnp.float32)
        alive = o[:, 0] == o[:, 0]
        specular = o[:, 0] != o[:, 0]
        sel_prev = jnp.zeros((WAVE,), jnp.int32)
        wb_prev = jnp.zeros((WAVE,), jnp.float32)
        nee_prev = o[:, 0] != o[:, 0]
        for b in range(DEPTH):
            dim0 = smp.BOUNCE_DIM_BASE + b * smp.DIMS_PER_BOUNCE
            hit = sc.intersect(scene, o, d)
            lane_active = alive & hit.hit
            emit_gate = lane_active & (hit.light_id >= 0)
            w_emit = jnp.where((b == 0) | specular, 1.0, 0.0) \
                + jnp.where(nee_prev & (hit.light_id == sel_prev),
                            wb_prev, 0.0)
            le = sc.light_emission(scene.lights, hit.light_id, hit.uv, None)
            L = L + jnp.where(emit_gate[..., None],
                              w_emit[..., None] * beta * le, 0.0)
            bsdf = mats.compute_scattering(
                scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
                uv=hit.uv, textures=None, dpdv=hit.dpdv)
            do_nee = lane_active & (sl.match_count(bsdf, ALL_NON_SPECULAR) > 0)
            direct, lidx, selpdf = nee.uniform_sample_one_light(
                scene, hit, bsdf, -d, ws.u1(dim0 + smp.DIM_LIGHT_SELECT),
                ws.u2(dim0 + smp.DIM_LIGHT_U))
            L = L + jnp.where(do_nee[..., None], beta * direct, 0.0)
            f, wi, pdf, kind = sl.bsdf_sample(
                bsdf, -d, ws.u2(dim0 + smp.DIM_BSDF_U), ALL)
            cont = lane_active & ~spec.is_black(f) & (pdf > 0.0)
            specular = jnp.where(lane_active, (kind & SPECULAR) != 0,
                                 specular)
            wb = nee.path_mis_weight(scene, lidx, selpdf, hit.pos, wi,
                                     pdf, kind, f)
            sel_prev = jnp.where(lane_active, lidx, sel_prev)
            wb_prev = jnp.where(lane_active, wb, wb_prev)
            nee_prev = do_nee
            nb = beta * f * (jnp.abs(dot(wi, bsdf.ns))
                             / jnp.maximum(pdf, 1e-20))[..., None]
            beta = jnp.where((cont & spec.valid(nb))[..., None], nb, beta)
            alive = cont & spec.valid(nb)
            o = sc.offset_ray_origin(hit.pos, hit.pos_err, hit.ng, wi)
            d = jnp.where((jnp.sum(wi * wi, -1) < 1e-12)[:, None],
                          jnp.asarray([0., 0., 1.]), wi)
        return L
    timeit("+ emission + path-MIS weight", lvl_mis)

    # ---- full trace_wave (with + without compaction) -----------------
    @jax.jit
    def full():
        cfg = dataclasses.replace(config, max_depth=DEPTH,
                                  unroll_bounces=True)
        return integ.trace_wave(scene, camera, cfg, pixel_xy,
                                pixel_id, sample_id, base_key)
    timeit("full trace_wave (unroll)", full)


if __name__ == "__main__":
    main()
