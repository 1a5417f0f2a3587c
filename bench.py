"""Benchmark: Cornell-box path-tracing throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: camera paths traced per second (full PT, NEE+MIS, depth 8;
each path costs up to 3 ray queries per bounce).  The reference
publishes no numbers (BASELINE.md), so vs_baseline is the ratio
against a fixed anchor constant so the ratio is comparable across
rounds (BASELINE.md: "the first measured baseline will be produced by
this repo itself").

Robustness: the axon-tunnel remote compile nondeterministically kills
the client process, so the measurement runs in a child process with
retries; a persistent jax compilation cache makes retries cheap once
a compile has succeeded.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_PATHS_PER_S = 2.0e6
REPO = os.path.dirname(os.path.abspath(__file__))
MARK = "BENCH_RESULT "


def inner():
    sys.path.insert(0, REPO)
    import dataclasses
    import numpy as np
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/arendur_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from arendur_tpu.io import scenedesc
    from arendur_tpu.render import integrator as integ
    from arendur_tpu.filming import film as flm
    from arendur_tpu.sampling import sampler as smp

    res = (256, 256)
    spp = 16
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=spp, resolution_override=res)
    wave = 1 << 16
    config = dataclasses.replace(config, max_depth=8, wave_size=wave)

    w, h = film_cfg.resolution
    base_key = smp.make_base_key(0)
    total = w * h * spp

    @jax.jit
    def run_wave(state, ray_idx):
        pixel_id = ray_idx // spp
        sample_id = ray_idx % spp
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pixel_xy = jnp.stack([px, py], -1)
        pfilm, L = integ.trace_wave(
            scene, camera, config, pixel_xy, pixel_id.astype(jnp.int32),
            sample_id.astype(jnp.int32), base_key)
        return flm.film_splat_pixmajor(
            film_cfg, state, pfilm - pixel_xy, L, ray_idx[0] // spp,
            spp, mask=ray_idx < total)

    from arendur_tpu import utils
    state = flm.film_init(film_cfg, padded=True)
    idx0 = jnp.arange(wave, dtype=jnp.int32)
    run_wave = utils.compile_tpu(run_wave, state, idx0)
    state = run_wave(state, idx0)           # warmup/compile
    jax.block_until_ready(state)

    n_waves = (total + wave - 1) // wave
    t0 = time.perf_counter()
    for i in range(1, n_waves):
        idx = i * wave + jnp.arange(wave, dtype=jnp.int32)
        state = run_wave(state, idx)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    paths = (n_waves - 1) * wave
    paths_per_s = paths / max(dt, 1e-9)

    img = np.asarray(flm.film_finalize(state, film_cfg))
    assert np.isfinite(img).all(), "render produced non-finite pixels"
    assert img.max() > 0.01, "render is black"

    # ---- textured throughput (BASELINE config 3) -------------------
    # same Cornell geometry with a 256^2 checkerboard kd texture on
    # every matte material: every hit pays the texture pipeline (hit
    # kernel -> XLA mipmap gathers -> shade kernel)
    tex_paths_per_s = 0.0
    try:
        from arendur_tpu.texturing.texture import AtlasBuilder
        ch = (np.indices((256, 256)).sum(0) // 16 % 2).astype(np.float32)
        img_t = np.stack([ch * 0.8 + 0.1, ch * 0.5 + 0.2,
                          np.full_like(ch, 0.6)], -1)
        ab = AtlasBuilder()
        tid = ab.add_image(img_t)
        atlas = ab.build()
        mt = scene.materials
        kd_tex = np.where(np.asarray(mt.mtype) == 0, tid,
                          np.asarray(mt.kd_tex))
        scene_t = scene.replace(materials=mt.replace(
            kd_tex=kd_tex.astype(np.int32)))
        config_t = dataclasses.replace(config, textures=atlas)

        @jax.jit
        def run_wave_t(state, ray_idx):
            pixel_id = ray_idx // spp
            sample_id = ray_idx % spp
            px = (pixel_id % w).astype(jnp.float32)
            py = (pixel_id // w).astype(jnp.float32)
            pixel_xy = jnp.stack([px, py], -1)
            pfilm, L = integ.trace_wave(
                scene_t, camera, config_t, pixel_xy,
                pixel_id.astype(jnp.int32), sample_id.astype(jnp.int32),
                base_key)
            return flm.film_splat_pixmajor(
                film_cfg, state, pfilm - pixel_xy, L, ray_idx[0] // spp,
                spp, mask=ray_idx < total)

        state_t = flm.film_init(film_cfg, padded=True)
        run_wave_tc = utils.compile_tpu(run_wave_t, state_t, idx0)
        state_t = run_wave_tc(state_t, idx0)
        jax.block_until_ready(state_t)
        reps_t = 4
        t0 = time.perf_counter()
        for i in range(1, reps_t + 1):
            idx = (i % n_waves) * wave + jnp.arange(wave, dtype=jnp.int32)
            state_t = run_wave_tc(state_t, idx)
        jax.block_until_ready(state_t)
        dt_t = time.perf_counter() - t0
        tex_paths_per_s = reps_t * wave / max(dt_t, 1e-9)
        img_tx = np.asarray(flm.film_finalize(state_t, film_cfg))
        assert np.isfinite(img_tx).all() and img_tx.max() > 0.01
    except Exception as e:                     # pragma: no cover
        sys.stderr.write(f"[bench] textured leg failed: {e}\n")

    # ---- fwd+bwd: one material-optimization step per wave ----------
    # (BASELINE.json's metric is rays/s/chip forward+backward; this
    # measures jax.value_and_grad of the film-MSE w.r.t. the material
    # kd column through the full differentiable wave)
    target = jnp.asarray(img.reshape(-1, 3))
    kd0 = jnp.asarray(scene.materials.kd)

    @jax.jit
    def train_wave(kd, ray_idx):
        scene2 = scene.replace(materials=scene.materials.replace(kd=kd))
        pixel_id = ray_idx // spp
        sample_id = ray_idx % spp
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pixel_xy = jnp.stack([px, py], -1)

        def loss_fn(kd_):
            sc3 = scene2.replace(
                materials=scene2.materials.replace(kd=kd_))
            pfilm, L = integ.trace_wave(
                sc3, camera, config, pixel_xy,
                pixel_id.astype(jnp.int32), sample_id.astype(jnp.int32),
                base_key)
            st = flm.film_init(film_cfg)
            st = flm.film_splat(film_cfg, st, pfilm, L,
                                mask=ray_idx < total)
            img2 = jnp.where(
                (st.weight > 0.0)[:, None],
                st.rgb / jnp.maximum(st.weight, 1e-8)[:, None], 0.0)
            return jnp.mean((img2 - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(kd)
        return kd - 0.05 * g, loss

    fwd_bwd_paths_per_s = 0.0
    try:
        train_wave_c = utils.compile_tpu(train_wave, kd0, idx0)
        kd, _ = train_wave_c(kd0, idx0)      # warmup/compile
        jax.block_until_ready(kd)
        reps = 3
        t0 = time.perf_counter()
        for i in range(1, reps + 1):
            idx = (i % n_waves) * wave + jnp.arange(wave, dtype=jnp.int32)
            kd, _ = train_wave_c(kd, idx)
        jax.block_until_ready(kd)
        dt_b = time.perf_counter() - t0
        fwd_bwd_paths_per_s = reps * wave / max(dt_b, 1e-9)
    except Exception as e:                     # pragma: no cover
        sys.stderr.write(f"[bench] fwd+bwd leg failed: {e}\n")

    print(MARK + json.dumps({
        "metric": "cornell_pt_paths_per_s",
        "value": round(float(paths_per_s), 2),
        "unit": "paths/s (256x256, 16spp, depth8, NEE+MIS)",
        "vs_baseline": round(float(paths_per_s / BASELINE_PATHS_PER_S), 4),
        "fwd_bwd_paths_per_s": round(float(fwd_bwd_paths_per_s), 2),
        "textured_paths_per_s": round(float(tex_paths_per_s), 2),
    }), flush=True)


def main():
    attempts = 5
    for i in range(attempts):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True, text=True, timeout=2100)
        for line in (proc.stdout or "").splitlines():
            if line.startswith(MARK):
                print(line[len(MARK):])
                return 0
        sys.stderr.write(
            f"[bench] attempt {i + 1}/{attempts} failed "
            f"(rc={proc.returncode}); retrying\n")
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        for t in tail:
            sys.stderr.write("[bench]   " + t + "\n")
        time.sleep(10)
    # all attempts failed: emit a zero measurement rather than nothing
    print(json.dumps({
        "metric": "cornell_pt_paths_per_s",
        "value": 0.0,
        "unit": "paths/s (256x256, 16spp, depth8, NEE+MIS)",
        "vs_baseline": 0.0,
    }))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner()
    else:
        sys.exit(main())
