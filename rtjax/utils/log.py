"""Structured logging for the framework.

The reference logs via bare ``std::cout`` prints (mesh stats main.cu:64,
BVH stats bvh.cuh:203-204, phase timings profiler.hpp:15-29) with no levels
or destinations.  SURVEY.md §5 asks for real structured logging: every
informational print in the package routes through this module-level
``logger`` so applications can set levels, add handlers, or silence the
framework entirely (``logging.getLogger("rtjax").setLevel(...)``).

The default handler writes bare messages to stderr at INFO so the
out-of-the-box output matches the reference's plain prints.
"""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger("rtjax")

if not logger.handlers:  # idempotent under re-import
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False


def set_verbosity(level) -> None:
    """Set the framework log level (int or logging name, e.g. "DEBUG")."""
    logger.setLevel(level)
