"""Quantify the theta-uniform sphere-light compat bias (VERDICT r4
item 8): render the golden-gate Cornell config twice — once with the
reference's biased (theta, phi)-uniform sphere sampling (the parity
default) and once with correct area-uniform sampling — and report
each run's block-MSE/mean-delta against the golden image.

Run on CPU (deterministic, no chip needed):
    python tools/measure_theta_bias.py
"""

import dataclasses
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one(mode: str):
    env = dict(os.environ, ARENDUR_SPHERE_THETA=mode,
               JAX_PLATFORMS="cpu")
    code = r"""
import dataclasses, os, sys
import numpy as np
sys.path.insert(0, %r)
from arendur_tpu.io import scenedesc
from arendur_tpu.render import integrator as integ

def block_mean(a, f):
    h, w, _ = a.shape
    return a.reshape(h // f, f, w // f, f, 3).mean((1, 3))

golden = np.load(os.path.join(%r, "tests/data/cornell_golden_128x96.npy"))
g64 = block_mean(golden, 2)
scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
    os.path.join(%r, "examples/cornellbox/cb.json"),
    spp_override=32, resolution_override=(64, 48))
config = dataclasses.replace(config, max_depth=8, wave_size=64*48*32)
img = np.clip(np.asarray(integ.render(scene, camera, film_cfg, config)),
              0.0, 1.0)
mse = float(((block_mean(img, 4) - block_mean(g64, 4)) ** 2).mean())
dmean = float(abs(img.mean() - g64.mean()))
print("RESULT", mse, dmean)
""" % (REPO, REPO, REPO)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, mse, dmean = line.split()
            return float(mse), float(dmean)
    raise RuntimeError(out.stderr[-2000:])


if __name__ == "__main__":
    for mode in ("compat", "area"):
        mse, dmean = _one(mode)
        print(f"{mode:7s}: mse_ds4={mse:.3e}  |dmean|={dmean:.3e}")
