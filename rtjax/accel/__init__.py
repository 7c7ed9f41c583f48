"""Acceleration structures: sweep-SAH BVH builders + flattened device arrays.

Two builders with identical outputs (same algorithm, bvh.cuh:30-219):
- :mod:`rtjax.accel.builder_cpp` — native C++ extension, the fast path for
  million-triangle scenes (the reference's builder is host C++ too);
- :mod:`rtjax.accel.builder_np` — NumPy fallback / correctness oracle.
"""

from __future__ import annotations

import numpy as np

from .bvh import BuildResult, BvhArrays, validate
from .builder_np import build_bvh as build_bvh_np


def build_bvh_best(bmin, bmax, centers=None, max_depth=30,
                   max_leaf_size=None, min_leaf_size=1,
                   which: str = "auto") -> BuildResult:
    """Dispatch to the C++ builder when available, else NumPy.

    ``which``: "auto" | "cpp" | "numpy".
    """
    if which in ("auto", "cpp"):
        try:
            from .builder_cpp import build_bvh as build_bvh_cpp
            return build_bvh_cpp(bmin, bmax, centers, max_depth=max_depth,
                                 max_leaf_size=max_leaf_size,
                                 min_leaf_size=min_leaf_size)
        except Exception as e:
            if which == "cpp":
                raise
            from ..utils.log import logger
            logger.warning("C++ BVH builder unavailable (%s); falling back "
                           "to the NumPy builder — expect slow builds on "
                           "million-triangle scenes", e)
    return build_bvh_np(np.asarray(bmin), np.asarray(bmax),
                        None if centers is None else np.asarray(centers),
                        max_depth=max_depth, max_leaf_size=max_leaf_size,
                        min_leaf_size=min_leaf_size)


__all__ = ["BuildResult", "BvhArrays", "validate", "build_bvh_np",
           "build_bvh_best"]
