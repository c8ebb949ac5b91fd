"""Per-stage timers and device tracing for the streaming pipelines.

The reference's observability is wall-clock prints per tool
(``gs360_GUI.py:9074-9103``) and 5%%-step progress lines. The rebuild adds
what a device pipeline actually needs (SURVEY §5): accumulated per-stage
timers (decode / warp / fetch / encode) surfaced on the execution report,
and an opt-in ``jax.profiler`` trace — set ``GS360X_TRACE_DIR=/path`` and
every ``run_plan`` writes a TensorBoard-loadable device trace there.
"""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Iterator


class StageTimers:
    """Thread-safe accumulated wall-clock per named pipeline stage.

    Stages run concurrently (decode in the prefetch thread, fetch/encode
    in the main thread), so per-stage sums can exceed the total wall
    clock — that overlap is the point of the pipeline.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def wrap_iter(self, name: str, iterator) -> Iterator:
        """Time each ``next()`` of an iterator (e.g. the decode source
        driven from the prefetch thread)."""
        it = iter(iterator)
        while True:
            with self.stage(name):
                try:
                    item = next(it)
                except StopIteration:
                    return
            yield item

    def report(self) -> str:
        with self._lock:
            parts = [f"{k} {self.totals[k]:.2f}s/{self.counts[k]}"
                     for k in sorted(self.totals)]
        return " | ".join(parts) if parts else "no stages recorded"


@contextmanager
def maybe_trace(label: str = "gs360x"):
    """``jax.profiler.trace`` wrapper, active only when ``GS360X_TRACE_DIR``
    is set (so production runs pay nothing)."""
    trace_dir = os.environ.get("GS360X_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield


__all__ = ["StageTimers", "maybe_trace"]
