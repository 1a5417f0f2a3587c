"""Run the reference's own headline workload once (VERDICT r4 item 4).

Renders examples/cornellbox/cb.json at the reference's full config —
1024x768, 32x32 = 1024 spp, max_depth 8 (cb.json:82-113) — on the
local chip, records wall-clock + paths/s, and diffs the result
against the reference's published render
(/root/reference/cornellbox.png) with the golden-gate block-MSE
machinery at full resolution.

The reference PNG stores raw linear radiance clamped to [0,1] with no
gamma (src/spectrum/mod.rs:368-392, src/filming/film.rs:380-391), so
the diff runs in linear space on the un-gamma'd film.

Robustness: the axon-tunnel remote compile nondeterministically kills
the client, so the render runs in a child process with the
integrator's own checkpoint/resume (bit-identical to an uninterrupted
render); retries resume instead of restarting.

Outputs (repo root):
  cornellbox_tpu.png   our render, linear-clamped u8 like the reference
  REFWORKLOAD.json     {wall_s, paths_per_s, mse_ds4, dmean, ...}
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "cornellbox_tpu.ckpt.npz")
NPY = os.path.join(REPO, "cornellbox_tpu_linear.npy")
PNG = os.path.join(REPO, "cornellbox_tpu.png")
REF_PNG = "/root/reference/cornellbox.png"
OUT = os.path.join(REPO, "REFWORKLOAD.json")
MARK = "REFWORKLOAD_DONE"


def inner():
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/arendur_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import dataclasses
    from arendur_tpu.io import scenedesc
    from arendur_tpu.render import integrator as integ

    scene, camera, film_cfg, config, _ = scenedesc.parse_scene(
        os.path.join(REPO, "examples/cornellbox/cb.json"))
    config = dataclasses.replace(config, wave_size=1 << 16)
    w, h = film_cfg.resolution
    print(f"reference workload: {w}x{h}, {config.spp} spp, "
          f"depth {config.max_depth}", flush=True)
    img = integ.render(scene, camera, film_cfg, config,
                       checkpoint_path=CKPT, checkpoint_every=256,
                       progress=False)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    np.save(NPY, img)
    print(MARK, flush=True)


def main():
    total = 1024 * 768 * 1024
    t_file = os.path.join(REPO, "cornellbox_tpu.time")
    spent = 0.0
    if os.path.exists(t_file):
        spent = float(open(t_file).read().strip() or 0.0)
    attempts = 40
    for i in range(attempts):
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True, text=True, timeout=7200)
        spent += time.perf_counter() - t0
        with open(t_file, "w") as f:
            f.write(str(spent))
        if MARK in (proc.stdout or ""):
            break
        tail = (proc.stderr or "").strip().splitlines()[-4:]
        sys.stderr.write(f"[refwork] attempt {i+1} died "
                         f"(rc={proc.returncode}); resuming\n")
        for t in tail:
            sys.stderr.write("[refwork]   " + t + "\n")
        time.sleep(10)
    else:
        sys.stderr.write("[refwork] all attempts failed\n")
        return 1

    import numpy as np
    from PIL import Image
    img = np.load(NPY)                       # [H, W, 3] linear
    lin8 = np.clip(img, 0.0, 1.0)
    Image.fromarray((lin8 * 255.0 + 0.5).astype(np.uint8),
                    mode="RGB").save(PNG)
    ref = np.asarray(Image.open(REF_PNG).convert("RGB"),
                     dtype=np.float32) / 255.0
    assert ref.shape == img.shape, (ref.shape, img.shape)

    def block(a, f):
        hh, ww, _ = a.shape
        return a.reshape(hh // f, f, ww // f, f, 3).mean((1, 3))

    ours = np.clip(img, 0.0, 1.0)
    mse = float(((ours - ref) ** 2).mean())
    mse_ds4 = float(((block(ours, 4) - block(ref, 4)) ** 2).mean())
    mse_ds16 = float(((block(ours, 16) - block(ref, 16)) ** 2).mean())
    dmean = float(ours.mean() - ref.mean())
    result = {
        "workload": "examples/cornellbox/cb.json (reference config)",
        "resolution": [1024, 768], "spp": 1024, "max_depth": 8,
        "paths": total,
        "wall_s": round(spent, 1),
        "paths_per_s": round(total / max(spent, 1e-9), 1),
        "mse_full": round(mse, 6),
        "mse_ds4": round(mse_ds4, 6),
        "mse_ds16": round(mse_ds16, 6),
        "mean_delta": round(dmean, 6),
        "ref_image": REF_PNG,
        "our_image": "cornellbox_tpu.png",
        "note": "wall_s includes compile + any tunnel-retry resume "
                "overhead; diff in linear space (reference PNG is "
                "linear-clamped, spectrum/mod.rs:368-392)",
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner()
    else:
        sys.exit(main())
