"""Tuning experiments for the cluster-culled Pallas intersector on the
real chip: camera-ray vs incoherent-ray workloads, with accuracy
checked against the plain-XLA path on the same cluster tables."""

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
    w = scene.tri_cw
    cbox = scene.tri_cbox
    k = w.shape[-1] // 4
    c = w.shape[0]
    print("clusters", c, "K", k, "tris", scene.tri_v0.shape[0])

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-4, 4, (WAVE, 3)).astype(np.float32))
    d = rng.normal(size=(WAVE, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((WAVE,), np.inf, jnp.float32)

    @jax.jit
    def ref(o, d):
        return mxi.intersect_mxu(w, o, d, tmax, c * k, chunk=k)
    dt, (rt, ri, _, _) = bench(ref, o, d)
    print(f"XLA mxu (no culling): {dt*1e3:8.3f} ms")

    @jax.jit
    def run(o, d):
        return pli.intersect_clusters(w, cbox, o, d, tmax)
    dt, (t, i) = bench(run, o, d)
    mismatch = (np.asarray(i) != np.asarray(ri)).mean()
    print(f"pallas clusters (incoherent rays): {dt*1e3:8.3f} ms  "
          f"idx-mismatch {mismatch:.2e}")

    for frac in (1.0, 0.5, 0.25, 0.125):
        na = jnp.int32(int(WAVE * frac))

        @jax.jit
        def run_na(o, d, na):
            return pli.intersect_clusters(w, cbox, o, d, tmax,
                                          n_alive=na)
        dt, _ = bench(run_na, o, d, na)
        print(f"pallas n_alive={frac:5.3f}*N: {dt*1e3:8.3f} ms")

    @jax.jit
    def run_occ(o, d):
        return pli.occluded_clusters(w, cbox, o, d,
                                     jnp.full((WAVE,), 10.0))
    dt, _ = bench(run_occ, o, d)
    print(f"pallas occluded: {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
