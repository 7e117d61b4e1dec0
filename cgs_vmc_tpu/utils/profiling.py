"""Profiling hooks: jax.profiler traces around training epochs.

The reference had no tracing/profiling of any kind (SURVEY.md §5.1; its
own TODOs at cgs_vmc/training.py:26,606 admit metrics belonged in
summaries).  Here a trace context can wrap any epoch range; the resulting
TensorBoard-compatible trace shows sampler sweeps, local-energy fan-out
and collective time per epoch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler.trace(trace_dir) when a directory is given, no-op
    otherwise."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class EpochTimer:
    """Wall-clock phase timing without device synchronization overhead
    beyond one block per epoch."""

    def __init__(self):
        self._start = time.perf_counter()
        self.history: list[float] = []

    def lap(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        elapsed = now - self._start
        self._start = now
        self.history.append(elapsed)
        return elapsed
