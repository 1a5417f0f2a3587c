"""Native (C++) host-runtime components, loaded via ctypes.

The reference's runtime is native Rust; the host-side pieces of this
framework that sit on the render-start critical path (currently the
binned-SAH BVH build, ref: src/component/bvh.rs:246-415) are C++ with
a NumPy fallback when no compiler is available.  The compute path
itself stays JAX/XLA/Pallas — this is only the scene-build runtime.

The shared library is compiled on first use (g++ -O2, cached next to
the source); `load()` returns None when compilation fails so callers
can fall back.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("arendur_tpu.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libarendur_native.so")
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _compile() -> bool:
    cmd = ["g++", "-O2", "-march=native", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        log.warning("native build failed to launch: %s", e)
        return False
    if res.returncode != 0:
        log.warning("native build failed:\n%s", res.stderr.decode())
        return False
    return True


def load():
    """Load (compiling if needed) the native library, or None."""
    global _lib, _lib_tried
    with _lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.warning("native library load failed: %s", e)
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.arendur_bvh_build.restype = ctypes.c_int32
        lib.arendur_bvh_build.argtypes = [
            f32p, f32p, f32p, ctypes.c_int32, ctypes.c_int32, i32p]
        lib.arendur_bvh_export.restype = ctypes.c_int32
        lib.arendur_bvh_export.argtypes = [f32p, f32p, i32p, i32p, i32p,
                                           i32p]
        _lib = lib
        return _lib


def build_bvh_native(v0, v1, v2, max_leaf: int = 4):
    """Binned-SAH build in C++; returns the same node SoA dict as the
    NumPy builder (bit-identical algorithm) or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = len(v0)
    if t == 0:
        return None
    order = np.empty(t, np.int32)
    with _lock:
        m = int(lib.arendur_bvh_build(v0, v1, v2, t, int(max_leaf), order))
        if m <= 0:
            return None
        bmin = np.empty((m, 3), np.float32)
        bmax = np.empty((m, 3), np.float32)
        second = np.empty(m, np.int32)
        start = np.empty(m, np.int32)
        count = np.empty(m, np.int32)
        axis = np.empty(m, np.int32)
        if int(lib.arendur_bvh_export(bmin, bmax, second, start, count,
                                      axis)) != 0:
            return None
    return dict(bmin=bmin, bmax=bmax, second=second, start=start,
                count=count, axis=axis, order=order)
