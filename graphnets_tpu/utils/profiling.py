"""Tracing / profiling hooks (SURVEY.md §5: the reference only has
``@showprogress``; TPU-native equivalent: ``jax.profiler`` trace capture +
named step annotations, viewable in Perfetto/XProf)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace to ``log_dir`` (Perfetto/XProf)."""
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False  # some PJRT plugins don't support tracing
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def annotate(name: str):
    """Named range for profiler traces (use around step fns)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup exclusion (compile steps)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def count(self) -> int:
        return len(self._times)
