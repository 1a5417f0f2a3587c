"""Rays/s vs device-count scaling harness (BASELINE scaling gate;
SURVEY.md §7 M6 'rays/s scaling harness at 1 chip / 1 host / >=2
hosts').

Each device count runs in a fresh subprocess (the CPU device count is
fixed at backend init).  The child renders the Cornell box sharded
over an N-device mesh, times steady-state waves, and prints one JSON
line; the parent collects them into SCALING.json with efficiency
relative to 1 device.

On real hardware the same harness runs unchanged on TPU meshes (the
mesh comes from jax.devices()); here the virtual CPU mesh validates
the sharding path and the harness itself.

Usage:  python tools/scaling_harness.py [--devices 1,2,4,8]
        python tools/scaling_harness.py --child N    (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RES = (64, 64)
SPP = 4
DEPTH = 2


def child(n_dev: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from arendur_tpu.io import scenedesc
    from arendur_tpu.parallel import mesh as pmesh
    from arendur_tpu.filming import film as flm

    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    total = RES[0] * RES[1] * SPP
    config = dataclasses.replace(config, max_depth=DEPTH,
                                 wave_size=total)
    mesh = pmesh.make_ray_mesh(np.array(jax.devices()))
    run = pmesh.sharded_render_fn(scene, camera, film_cfg, config, mesh)
    idx = jnp.arange(total, dtype=jnp.int32)
    state = run(idx)              # compile + warm
    jax.block_until_ready(state)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        state = run(idx)
    jax.block_until_ready(jax.device_get(state.rgb))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"devices": n_dev, "paths_per_s": total / dt,
                      "wave": total, "wall_s": dt}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args()
    if args.child:
        child(args.child)
        return
    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, env=env, timeout=1200)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        rows.append(json.loads(line))
        print(rows[-1])
    base = rows[0]["paths_per_s"]
    for r in rows:
        r["efficiency"] = r["paths_per_s"] / (base * r["devices"])
    with open(args.out, "w") as f:
        json.dump({"workload": {"res": RES, "spp": SPP, "depth": DEPTH},
                   "rows": rows}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
