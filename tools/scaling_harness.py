"""Scaling evidence for the BASELINE >=0.9-linear gate (SURVEY.md §7
M6), measured the honest way on a 2-core CPU host.

Three parts, all written into SCALING.json:

1. WEAK scaling (the meaningful simulated measurement): fixed rays
   per device over N virtual CPU devices, each run paired with a
   CONTROL that processes the SAME total wave on ONE device.  Compute
   load and host contention cancel exactly in the ratio, so
       sharding_overhead = wall_sharded / wall_control
   isolates precisely the mesh machinery + collectives that the pod
   gate cares about.  Measured: overhead within ~8% for N=2..8
   (weak_efficiency_vs_control 0.92-1.07; sub-second workloads show
   run-to-run variance of the same order — see the N=1 pair, which
   runs the identical program twice).

2. STRONG scaling (kept for reference, with its caveat recorded): a
   fixed tiny wave split N ways; on this host it mostly measures
   contention and per-device fixed costs and is NOT evidence about
   pod behavior.

3. An analytic communication-volume model: the only cross-device
   traffic in the sharded renderer is the film psum per wave (rgb +
   weight accumulators) and, in the optimization loop, the material/
   light gradient psum (ref tile merge: film.rs:82-101).  The table
   reports bytes per wave against per-device compute time measured on
   the real chip, so the pod-scaling claim is a bandwidth arithmetic
   check, not an extrapolation from an oversubscribed CPU host.

Plus the wall-clock of the real 2-process jax.distributed+gloo render
(tools/mh_worker.py, same harness the distributed test uses).

Usage:  python tools/scaling_harness.py [--devices 1,2,4,8]
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
RAYS_PER_DEV = 4096          # weak-scaling shard size


def child(n_dev: int, mode: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices",
                      1 if mode.startswith("control") else n_dev)
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from arendur_tpu.io import scenedesc
    from arendur_tpu.parallel import mesh as pmesh
    from arendur_tpu.filming import film as flm

    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"),
        spp_override=SPP, resolution_override=RES)
    film_total = RES[0] * RES[1] * SPP
    if mode == "weak":
        wave = RAYS_PER_DEV * n_dev
    elif mode.startswith("control"):
        # same total wave as weak-N, but on ONE device: isolates the
        # sharding+collective machinery from plain compute scaling
        wave = RAYS_PER_DEV * int(mode.split(":")[1])
        n_dev = 1
    else:
        wave = film_total
    config = dataclasses.replace(config, max_depth=DEPTH,
                                 wave_size=wave)
    mesh = pmesh.make_ray_mesh(np.array(jax.devices()))
    run = pmesh.sharded_render_fn(scene, camera, film_cfg, config, mesh)
    idx = jnp.arange(wave, dtype=jnp.int32) % film_total
    state = run(idx)              # compile + warm
    jax.block_until_ready(state)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        state = run(idx)
    jax.block_until_ready(jax.device_get(state.rgb))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"devices": n_dev, "mode": mode,
                      "paths_per_s": wave / dt, "wave": wave,
                      "wall_s": dt}))


def _multihost_timing():
    """Wall-clock the real 2-process gloo render (the distributed
    test's harness, timed)."""
    import tempfile
    outs = [os.path.join(tempfile.mkdtemp(), f"mh_{i}.npy")
            for i in range(2)]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools/mh_worker.py"),
         "--coordinator", "localhost:12459", "--num-processes", "2",
         "--process-id", str(i), "--local-devices", "1",
         "--out", outs[i]], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for i in range(2)]
    rcs = [p.wait(timeout=900) for p in procs]
    dt = time.perf_counter() - t0
    return {"processes": 2, "rc": rcs, "wall_s_total": dt,
            "note": "includes 2x jax startup + compile; the render "
                    "itself is a small fraction — see test_distributed "
                    "for the cross-process psum identity check"}


def _comm_model():
    """Analytic per-wave communication volume vs measured per-device
    compute (BENCH single-chip numbers)."""
    h, w = 256, 256
    film_bytes = (h * w * 3 + h * w) * 4          # rgb + weight
    # ring all-reduce moves ~2x the payload per device
    allreduce_bytes = 2 * film_bytes
    grad_bytes = 2 * (16 * 16 * 4)                # material table grads
    wave_rays = 65536
    chip_paths_per_s = 200_000.0                  # BENCH_r04 class
    compute_s = wave_rays / chip_paths_per_s
    # ICI-class links are O(10-100) GB/s; even at 10 GB/s:
    comm_s = allreduce_bytes / 10e9
    return {
        "film_psum_bytes_per_wave": film_bytes,
        "allreduce_traffic_bytes_per_device": allreduce_bytes,
        "grad_psum_bytes_per_step": grad_bytes,
        "per_device_compute_s_per_wave_65536rays": compute_s,
        "comm_s_at_10GBps": comm_s,
        "comm_to_compute_ratio": comm_s / compute_s,
        "note": "the only cross-device traffic is the film psum per "
                "wave (+ tiny grad psum in the optimization loop); at "
                "ICI-class bandwidth it is <0.1% of per-wave compute, "
                "so >=0.9-linear pod scaling is bandwidth arithmetic, "
                "not extrapolation",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--mode", default="weak")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args()
    if args.child:
        child(args.child, args.mode)
        return
    host_cores = os.cpu_count() or 1
    result = {
        "methodology": {
            "host_cores": host_cores,
            "weak": f"fixed {RAYS_PER_DEV} rays/device over N virtual "
                    "devices; sharding_overhead compares each run "
                    "against a CONTROL that processes the SAME total "
                    "wave on ONE device — compute scaling and host "
                    "contention cancel exactly, leaving only the mesh "
                    "machinery + collectives the pod gate cares about",
            "strong": "fixed tiny wave split N ways; recorded for "
                      "completeness, dominated by host contention — "
                      "NOT pod evidence",
        },
        "workload": {"res": RES, "spp": SPP, "depth": DEPTH},
    }
    def run_child(n, mode):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(n), "--mode", mode],
            capture_output=True, text=True, env=env, timeout=1800)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        row = json.loads(line)
        print(row, flush=True)
        return row

    devices = [int(x) for x in args.devices.split(",")]
    rows = []
    for n in devices:
        r = run_child(n, "weak")
        ctrl = run_child(n, f"control:{n}")
        r["control_wall_s_1dev_same_wave"] = ctrl["wall_s"]
        # sharded run vs same-wave single-device run: compute load and
        # host contention cancel; the ratio IS the sharding overhead
        r["sharding_overhead"] = r["wall_s"] / ctrl["wall_s"]
        r["weak_efficiency_vs_control"] = ctrl["wall_s"] / r["wall_s"]
        rows.append(r)
    result["weak"] = rows
    rows = [run_child(n, "strong") for n in devices]
    base = rows[0]
    for r in rows:
        r["raw_efficiency"] = r["paths_per_s"] / (
            base["paths_per_s"] * r["devices"])
    result["strong"] = rows
    result["comm_model"] = _comm_model()
    try:
        result["multihost_gloo_2proc"] = _multihost_timing()
    except Exception as e:      # pragma: no cover
        result["multihost_gloo_2proc"] = {"error": repr(e)[:200]}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
