"""ctypes wrapper for the native C++ sweep-SAH builder.

The reference's builder is host C++ (bvh.cuh:30-219); this is the
first-class native equivalent (SURVEY.md §2 native-component summary #3).
pybind11 is not available in this environment, so the extension exposes a
plain C ABI (rtjax/accel/cpp/bvh_builder.cpp) consumed via ctypes.  The
shared library is compiled on first use with g++ -O3 and cached next to the
source; delete ``cpp/libbvh.so`` to force a rebuild.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..constants import BVH_MAX_DEPTH
from .bvh import BuildResult

_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libbvh.so")
_lock = threading.Lock()
_lib = None


def _compile() -> None:
    # -ffp-contract=off: no FMA contraction, so SAH costs are bit-identical
    # with the NumPy oracle (FMA flips leaf decisions on cost ties)
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-std=c++17",
           "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _compile()
        lib = ctypes.CDLL(_LIB)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.rtjax_build_bvh.restype = ctypes.c_int64
        lib.rtjax_build_bvh.argtypes = [
            f32p, f32p, f32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i64p, i32p,
        ]
        _lib = lib
        return lib


def build_bvh(tri_bmin, tri_bmax, centers=None,
              max_depth: int = BVH_MAX_DEPTH,
              max_leaf_size: int | None = None,
              min_leaf_size: int = 1) -> BuildResult:
    """Native sweep-SAH build; same contract as builder_np.build_bvh."""
    lib = _load()
    bmin = np.ascontiguousarray(tri_bmin, np.float32)
    bmax = np.ascontiguousarray(tri_bmax, np.float32)
    if centers is None:
        centers = 0.5 * (bmin + bmax)
    centers = np.ascontiguousarray(centers, np.float32)
    n = len(bmin)

    cap = 2 * n
    out_bmin = np.empty((cap, 3), np.float32)
    out_bmax = np.empty((cap, 3), np.float32)
    out_left = np.empty(cap, np.int32)
    out_num = np.empty(cap, np.int32)
    out_perm = np.empty(n, np.int64)
    out_stats = np.zeros(2, np.int32)

    rc = lib.rtjax_build_bvh(
        bmin, bmax, centers, n, int(max_depth),
        0 if max_leaf_size is None else int(max_leaf_size),
        int(min_leaf_size),
        out_bmin, out_bmax, out_left, out_num, out_perm, out_stats)
    if rc < 0:
        raise RuntimeError(f"rtjax_build_bvh failed with code {rc}")

    return BuildResult(bmin=out_bmin, bmax=out_bmax, left_first=out_left,
                       num_prims=out_num, perm=out_perm,
                       num_nodes=int(out_stats[0]),
                       max_depth=int(out_stats[1]))
