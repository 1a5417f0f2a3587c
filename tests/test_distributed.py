"""Two-process jax.distributed CPU test: proves the multi-host film
psum path (SURVEY.md §2.13/§5.8; the collectives shard_map emits are
identical on TPU pods — only the transport (gloo TCP here, ICI/DCN
there) differs).

Spawns 2 OS processes, each exposing 2 virtual CPU devices; together
they form a 4-device global mesh, render the tiny fixture scene with
rays sharded over all 4 devices, and psum the film across the process
boundary.  Asserts both processes produce the identical image and
that it matches a single-process render (the counter-based sampler
makes ray->radiance independent of the device layout)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.slow   # heavy renders: excluded from
# the quick gate (pytest -m "not slow"); run the full suite before release

def test_two_process_film_psum(tmp_path):
    outs = [str(tmp_path / f"mh_{pid}.npy") for pid in range(2)]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)   # worker sets its own device count
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools/mh_worker.py"),
             "--coordinator", "localhost:12431",
             "--num-processes", "2", "--process-id", str(pid),
             "--local-devices", "2", "--out", outs[pid]],
            cwd=REPO, env=env))
    rcs = [p.wait(timeout=540) for p in procs]
    assert rcs == [0, 0], rcs

    img0 = np.load(outs[0])
    img1 = np.load(outs[1])
    # the psum makes the film identical on every process
    np.testing.assert_allclose(img0, img1, rtol=1e-6, atol=1e-7)

    # single-process reference render (same counter-based sampler
    # streams -> same radiance estimates regardless of sharding)
    from arendur_tpu.parallel.distributed import _tiny_setup
    from arendur_tpu.render import integrator as integ
    scene, camera, film_cfg, config = _tiny_setup()
    ref = np.asarray(integ.render(scene, camera, film_cfg, config))
    np.testing.assert_allclose(img0, ref, rtol=1e-4, atol=1e-5)
    assert img0.max() > 0.0
