"""Op-level TPU profile of the TEXTURED PT wave (bench leg 3).

Times the untextured vs textured wave, then traces the textured wave
with jax.profiler and dumps framework_op_stats so the textured
overhead (hit kernel / texel gathers / shade kernel / intersect) can
be attributed.  Run: python tools/profile_textured.py
"""
import dataclasses, glob, os, sys, time

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
from arendur_tpu.texturing.texture import AtlasBuilder
from arendur_tpu import utils

WAVE = 1 << 16
SPP = 16
RES = (256, 256)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arendur_trace_tex"
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    config = dataclasses.replace(config, max_depth=8, wave_size=WAVE)

    # same textured setup as bench.py leg 3
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

    base_key = smp.make_base_key(0)
    ray_idx = jnp.arange(WAVE, dtype=jnp.int32)
    pixel_id = (ray_idx // SPP).astype(jnp.int32)
    sample_id = (ray_idx % SPP).astype(jnp.int32)
    w = RES[0]
    px = (pixel_id % w).astype(jnp.float32)
    py = (pixel_id // w).astype(jnp.float32)
    pixel_xy = jnp.stack([px, py], -1)

    def make(sc_, cfg_):
        @jax.jit
        def f():
            return integ.trace_wave(sc_, camera, cfg_, pixel_xy,
                                    pixel_id, sample_id, base_key)
        return utils.compile_tpu(f)

    plain = make(scene, config)
    tex = make(scene_t, config_t)

    def timeit(name, fn, n=6):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:30s} {dt*1e3:9.2f} ms  "
              f"{WAVE/dt/1e3:8.1f}K paths/s")
        return dt

    # ablation: hybrid-split path with NO textured channel (kd_tex
    # stays -1 but config.textures is set) — isolates the split's
    # structural overhead (2 launches + pack/unpack + XLA middle)
    # from the texture gathers themselves
    scene_n = scene.replace(materials=mt.replace(
        kd_tex=np.full_like(np.asarray(mt.kd_tex), -1)))
    notex = make(scene_n, config_t)

    timeit("plain wave", plain)
    timeit("textured wave", tex)
    timeit("split, no textured channel", notex)

    with jax.profiler.trace(out):
        jax.block_until_ready(tex())

    planes = glob.glob(out + "/**/*.xplane.pb", recursive=True)
    print("xplane:", planes)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    for tool in ("framework_op_stats",):
        try:
            data, _ = r2t.xspace_to_tool_data(planes, tool, {})
            path = f"/tmp/{tool}_tex.out"
            with open(path, "w") as f:
                f.write(data if isinstance(data, str) else str(data))
            print("wrote", path, len(data))
        except Exception as e:
            print(tool, "FAILED", repr(e)[:200])


if __name__ == "__main__":
    main()
