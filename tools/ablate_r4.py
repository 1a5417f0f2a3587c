"""Round-4 ablation: isolate the r2->r3 bench regression and the
Pallas-shade win on the real chip (VERDICT r3 items 1-2).

Times one full 64K-ray Cornell wave (jit, steady state) under feature
toggles: {compact, defer_final_mis} x {ARENDUR_SHADE=pallas|xla}.
defer_final_mis=False drops the last-vertex MIS term — an ablation of
cost only, not a valid estimator.

Run: ARENDUR_SHADE=pallas python tools/ablate_r4.py
"""

import dataclasses
import json
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
from arendur_tpu.sampling import sampler as smp

WAVE = 1 << 16
SPP = 16
RES = (256, 256)
REPS = 5


def time_wave(config, scene, camera):
    w, h = RES
    base_key = smp.make_base_key(0)
    ray_idx = jnp.arange(WAVE, dtype=jnp.int32)
    pixel_id = ray_idx // SPP
    sample_id = ray_idx % SPP
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    pixel_xy = jnp.stack([px, py], -1)

    @jax.jit
    def wave():
        return integ.trace_wave(scene, camera, config, pixel_xy,
                                pixel_id.astype(jnp.int32),
                                sample_id.astype(jnp.int32), base_key)

    from arendur_tpu import utils
    wave = utils.compile_tpu(wave)
    out = wave()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = wave()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    return dt, float(np.asarray(out[1]).mean())


def main():
    scene, camera, film_cfg, config0, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    config0 = dataclasses.replace(config0, max_depth=8, wave_size=WAVE)

    rows = []
    for name, kw in [
        ("baseline", {}),
        ("no_compact", dict(compact=False)),
        ("no_final_mis", dict(defer_final_mis=False)),
        ("no_compact_no_final", dict(compact=False,
                                     defer_final_mis=False)),
    ]:
        cfg = dataclasses.replace(config0, **kw)
        dt, mean = time_wave(cfg, scene, camera)
        row = dict(config=name, shade=os.environ.get(
            "ARENDUR_SHADE", "auto"), ms_per_wave=round(dt * 1e3, 1),
            paths_per_s=round(WAVE / dt), mean_L=round(mean, 5))
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
