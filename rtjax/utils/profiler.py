"""Phase wall-clock profiler.

Equivalent of /root/reference/profiler.hpp:4-29 — the reference's global
single-slot timer that prints ``<name>... done. (X ms)`` around every pipeline
phase.  Same output format (so logs are comparable), plus a context-manager
API and an optional record dict for programmatic access.  For XLA-level
traces use ``jax.profiler.trace`` alongside.
"""

from __future__ import annotations

import contextlib
import time

from .log import logger


class Profiler:
    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.records: dict[str, float] = {}
        self._name: str | None = None
        self._start = 0.0

    def start(self, name: str) -> None:
        assert self._name is None, "profiler phases cannot nest"
        self._name = name
        logger.debug("%s...", name)
        self._start = time.perf_counter()

    def stop(self) -> float:
        assert self._name is not None, "profiler not started"
        ms = (time.perf_counter() - self._start) * 1e3
        self.records[self._name] = self.records.get(self._name, 0.0) + ms
        if self.verbose:
            # one record per phase, same text as the reference's two-part
            # print (profiler.hpp:18,27)
            logger.info("%s... done. (%.0f ms)", self._name, ms)
        self._name = None
        return ms

    @contextlib.contextmanager
    def phase(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop()


# module-level default, like the reference's global ``profiler`` (profiler.hpp:13)
profiler = Profiler()
