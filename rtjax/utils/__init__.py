"""Cross-cutting utilities: profiling, logging."""

from .profiler import Profiler, profiler  # noqa: F401
