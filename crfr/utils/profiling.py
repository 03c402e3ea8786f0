"""Tracing/profiling helpers (SURVEY.md §5.1).

The reference has manual timing only; here:
- ``trace(logdir)``: jax.profiler trace context (XProf/TensorBoard viewable,
  includes per-HLO and Pallas kernel timings),
- ``annotate(name)``: named range inside a trace,
- ``timed(fn)``: block_until_ready-fenced wall-clock timing for benchmark
  windows (async dispatch excluded from the measurement by the fence).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2):
    """→ (seconds_per_iter, last_result); fenced with block_until_ready."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
