"""Tuning experiments for the Pallas intersection kernel on the real
chip: ray-tile size and matmul precision, with accuracy checked
against the HIGHEST-precision XLA path."""

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
from arendur_tpu.shapes import pallas_intersect as pli
from arendur_tpu.shapes import mxu_intersect as mxi
from arendur_tpu.shapes.mxu_intersect import ray_features

WAVE = 1 << 16


def bench(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"))
    w = scene.tri_mxu_w
    chunk = w.shape[-1] // 4
    t_count = scene.tri_v0.shape[0]
    print("chunk", chunk, "tris", t_count)

    rng = np.random.default_rng(0)
    o = rng.uniform(-4, 4, (WAVE, 3)).astype(np.float32)
    d = rng.normal(size=(WAVE, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tmax = jnp.full((WAVE,), np.inf, jnp.float32)

    @jax.jit
    def ref(o, d):
        return mxi.intersect_mxu(w, o, d, tmax, t_count, chunk=chunk)
    dt, (rt, ri, rb0, rb1) = bench(ref, o, d)
    print(f"XLA mxu HIGHEST: {dt*1e3:8.3f} ms")
    rt = np.where(np.asarray(ri) >= 0, np.asarray(rt), 0)

    for rn in (128, 256, 512):
        for prec in ("highest", "high", "default"):
            os.environ["ARENDUR_MXU_PRECISION"] = prec
            pli._RAY_TILE_OVERRIDE = rn
            try:
                pli._run.clear_cache()
            except Exception:
                pass

            @jax.jit
            def run(o, d):
                return pli.intersect_pallas(w, o, d, tmax, t_count,
                                            chunk=chunk)
            try:
                dt, (t, i, b0, b1) = bench(run, o, d)
            except Exception as e:
                print(f"rn={rn} prec={prec}: FAIL {type(e).__name__}")
                continue
            i = np.asarray(i)
            t = np.where(i >= 0, np.asarray(t), 0)
            mismatch = (i != np.asarray(ri)).mean()
            terr = np.abs(t - rt).max()
            print(f"rn={rn:4d} prec={prec:8s}: {dt*1e3:8.3f} ms  "
                  f"idx-mismatch {mismatch:.2e}  max|dt| {terr:.2e}")


if __name__ == "__main__":
    main()
