"""Multi-host worker process for tests/test_distributed.py.

Must stay OUTSIDE the arendur_tpu package: the jax_num_cpu_devices /
gloo-collectives configs have to be set before any JAX backend is
initialized, and importing arendur_tpu (package __init__ re-exports)
touches JAX.  This script initializes the distributed runtime first,
then imports the renderer.

Usage:
  python tools/mh_worker.py --coordinator localhost:12431 \
      --num-processes 2 --process-id K --local-devices 2 --out out.npy
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="localhost:12431")
    p.add_argument("--num-processes", type=int, default=2,
                   dest="num_processes")
    p.add_argument("--process-id", type=int, required=True,
                   dest="process_id")
    p.add_argument("--local-devices", type=int, default=2,
                   dest="local_devices")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)

    import numpy as np
    from arendur_tpu.parallel.distributed import (
        _tiny_setup, render_multihost)
    ndev = len(jax.devices())
    assert ndev == args.num_processes * args.local_devices, \
        (ndev, "global device view did not form")
    scene, camera, film_cfg, config = _tiny_setup()
    img = render_multihost(scene, camera, film_cfg, config)
    np.save(args.out, img)
    print(f"proc {args.process_id}: ok ndev={ndev} "
          f"img_mean={img.mean():.6f}")


if __name__ == "__main__":
    main()
