"""arencli-compatible command line renderer
(ref: examples/arencli.rs: `arencli <INPUT> [-t N]`).

Usage:
    python -m arendur_tpu.cli scene.json [options]

Renders the JSON scene description (cb.json schema) with the
wavefront path tracer and saves a PNG, printing wall-clock time like
the reference ("Done! Time used: {:.4}s", arencli.rs:54-61).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="arendur_tpu renderer")
    ap.add_argument("input", help="JSON scene description")
    ap.add_argument("-o", "--output", default=None,
                    help="output PNG (defaults to scene's outputfilename)")
    ap.add_argument("--spp", type=int, default=None,
                    help="override samples per pixel")
    ap.add_argument("--res", default=None,
                    help="override resolution, e.g. 512x384")
    ap.add_argument("--depth", type=int, default=None,
                    help="override max path depth")
    ap.add_argument("--renderer", choices=("pt", "whitted", "bpt"),
                    default="pt")
    ap.add_argument("--intersector",
                    choices=("cluster", "bvh", "naive"),
                    default="cluster",
                    help="triangle intersection structure: 'cluster' "
                         "(SAH-cluster-culled MXU tables, default), "
                         "'bvh' (per-ray stack traversal), 'naive' "
                         "(brute-force wavefront)")
    ap.add_argument("--bvh", action="store_true",
                    help="deprecated alias for --intersector bvh")
    ap.add_argument("--wave", type=int, default=1 << 16,
                    help="rays per wavefront launch")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--resume", action="store_true",
                    help="checkpoint the film every few waves and "
                         "resume from <output>.ckpt.npz if present "
                         "(bit-identical to an uninterrupted render)")
    ap.add_argument("--checkpoint-every", type=int, default=4,
                    help="waves between checkpoints with --resume")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="per-wave progress + invalid-sample warnings")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from arendur_tpu.io import scenedesc
    from arendur_tpu.render import integrator as integ
    from arendur_tpu.filming import film as flm

    res = None
    if args.res:
        w, h = args.res.lower().split("x")
        res = (int(w), int(h))

    intersector = "bvh" if args.bvh else args.intersector
    scene, camera, film_cfg, config, outname = scenedesc.parse_scene(
        args.input, spp_override=args.spp, resolution_override=res,
        intersector=intersector)
    if args.depth is not None:
        config = dataclasses.replace(config, max_depth=args.depth)
    config = dataclasses.replace(config, wave_size=args.wave,
                                 seed=args.seed)

    out = args.output or outname
    print(f"rendering {args.input}: {film_cfg.resolution[0]}x"
          f"{film_cfg.resolution[1]}, {config.spp} spp, "
          f"depth {config.max_depth}, renderer={args.renderer}")
    if args.verbose:
        import logging
        logging.basicConfig(level=logging.INFO)
    t0 = time.time()
    if args.renderer == "pt":
        ckpt = (out + ".ckpt.npz") if args.resume else None
        img = integ.render(scene, camera, film_cfg, config,
                           checkpoint_path=ckpt,
                           checkpoint_every=args.checkpoint_every,
                           progress=args.verbose)
    elif args.renderer == "bpt":
        from arendur_tpu.render import bpt
        img = bpt.render_bpt(scene, camera, film_cfg, config)
    else:
        img = _render_whitted(scene, camera, film_cfg, config)
    import numpy as np
    img = np.asarray(img)
    dt = time.time() - t0
    print(f"Done! Time used: {dt:.4f}s")
    flm.save_png(img, out)
    print(f"saved {out}")
    return 0


def _render_whitted(scene, camera, film_cfg, config):
    import jax
    import jax.numpy as jnp
    from arendur_tpu.render import whitted
    from arendur_tpu.filming import film as flm
    from arendur_tpu.sampling import sampler as smp

    w, h = film_cfg.resolution
    spp = config.spp
    base_key = smp.make_base_key(config.seed)
    total = w * h * spp
    state = flm.film_init(film_cfg)
    wave = min(config.wave_size, total)

    @jax.jit
    def run_wave(state, ray_idx):
        pixel_id = ray_idx // spp
        sample_id = ray_idx % spp
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pixel_xy = jnp.stack([px, py], -1)
        pfilm, L = whitted.whitted_wave(
            scene, camera, config, pixel_xy, pixel_id.astype(jnp.int32),
            sample_id.astype(jnp.int32), base_key)
        return flm.film_splat(film_cfg, state, pfilm, L,
                              mask=ray_idx < total)

    n_waves = (total + wave - 1) // wave
    for i in range(n_waves):
        idx = i * wave + jnp.arange(wave, dtype=jnp.int32)
        state = run_wave(state, idx)
    return flm.film_finalize(state, film_cfg)


if __name__ == "__main__":
    sys.exit(main())
