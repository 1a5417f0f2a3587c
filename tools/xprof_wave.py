"""Op-level TPU profile of the full PT wave via jax.profiler +
tensorboard_plugin_profile conversion.  Prints the top-k HLO ops by
self time.  Run: python tools/xprof_wave.py [trace_dir]
"""
import dataclasses, glob, json, os, sys, time

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


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arendur_trace"
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    config = dataclasses.replace(config, max_depth=8, wave_size=WAVE)
    base_key = smp.make_base_key(0)
    ray_idx = jnp.arange(WAVE, dtype=jnp.int32)
    pixel_id = (ray_idx // SPP).astype(jnp.int32)
    sample_id = (ray_idx % SPP).astype(jnp.int32)
    w = RES[0]
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    pixel_xy = jnp.stack([px, py], -1)

    @jax.jit
    def full():
        return integ.trace_wave(scene, camera, config, pixel_xy,
                                pixel_id, sample_id, base_key)

    from arendur_tpu import utils
    full = utils.compile_tpu(full)
    jax.block_until_ready(full())
    with jax.profiler.trace(out):
        jax.block_until_ready(full())

    # convert: find the xplane file and dump framework op stats
    planes = glob.glob(out + "/**/*.xplane.pb", recursive=True)
    print("xplane:", planes)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = r2t.xspace_to_tool_data(planes, tool, {})
            with open(f"/tmp/{tool}.out", "w") as f:
                f.write(data if isinstance(data, str) else str(data))
            print("wrote", f"/tmp/{tool}.out", len(data))
        except Exception as e:
            print(tool, "FAILED", repr(e)[:200])


if __name__ == "__main__":
    main()
