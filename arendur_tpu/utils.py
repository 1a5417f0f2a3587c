"""Auxiliary subsystems: profiling, progress logging, checkpoint/resume
(SURVEY.md §5).

* Profiling — named phases like the reference's flame macros
  ("pt rendering" / "pt light calculation" / "pt add sample",
  pt.rs:129-157) map to `jax.profiler.TraceAnnotation` plus wall-clock
  accumulation; `profile_dump` writes a jax profiler trace directory.
* Checkpoint/resume — the render state is (film rgb/weight sums, next
  ray index, seed); because the sampler is stateless (counter-based
  threefry), saving those arrays makes spp-chunked resume exact.
  (The reference has no checkpointing; its closest hook is
  Sampler::set_sample_index, sample/mod.rs:93.)
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

import numpy as np

log = logging.getLogger("arendur_tpu")

_phase_totals: Dict[str, float] = {}


@contextlib.contextmanager
def profile_phase(name: str):
    """Named phase: contributes to wall-clock totals and emits a
    jax.profiler annotation when a trace is active."""
    import jax
    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    _phase_totals[name] = _phase_totals.get(name, 0.0) \
        + (time.perf_counter() - start)


def phase_totals() -> Dict[str, float]:
    return dict(_phase_totals)


def reset_phase_totals():
    _phase_totals.clear()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax profiler trace for the enclosed region
    (open with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# -- TPU compile options -----------------------------------------------------

# XLA places a pallas custom-call's whole operands/results in scoped
# VMEM when they fit its budget; with the intersect + shade kernels
# co-live in one bounce body the default 16 MiB budget overflows.
TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def compile_tpu(jitted, *args, **kwargs):
    """AOT-compile a jitted callable with the raised scoped-VMEM limit
    on TPU backends; returns the jitted fn unchanged on CPU (the limit
    is a libtpu flag)."""
    import jax
    try:
        if jax.default_backend() == "cpu":
            return jitted
        return jitted.lower(*args, **kwargs).compile(
            compiler_options=TPU_COMPILER_OPTIONS)
    except Exception:       # pragma: no cover - older jaxlib fallback
        log.warning("compile_tpu: AOT compile with options failed; "
                    "falling back to plain jit", exc_info=True)
        return jitted


# -- render checkpointing ----------------------------------------------------

def save_checkpoint(path: str, film_state, next_ray: int, seed: int,
                    meta: Optional[dict] = None):
    """Persist film accumulators + progress cursor to an .npz."""
    import jax
    meta = dict(meta or {})
    meta["padded"] = bool(getattr(film_state, "padded", False))
    np.savez_compressed(
        path,
        rgb=np.asarray(jax.device_get(film_state.rgb)),
        weight=np.asarray(jax.device_get(film_state.weight)),
        next_ray=np.asarray(next_ray, np.int64),
        seed=np.asarray(seed, np.int64),
        meta=json.dumps(meta))


def load_checkpoint(path: str):
    """Returns (film_state, next_ray, seed, meta) or None."""
    from arendur_tpu.filming.film import FilmState
    import jax.numpy as jnp
    if not os.path.exists(path):
        return None
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    state = FilmState(rgb=jnp.asarray(data["rgb"]),
                      weight=jnp.asarray(data["weight"]),
                      padded=bool(meta.get("padded", False)))
    return state, int(data["next_ray"]), int(data["seed"]), meta
