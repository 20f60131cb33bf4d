"""Tracing / profiling helpers (SURVEY.md §5).

The reference has zero instrumentation; here:

* :func:`steps_per_second` — ``block_until_ready``-bracketed throughput
  meter (the regression guard behind ``bench.py``);
* :func:`trace` — context manager around ``jax.profiler`` producing
  Perfetto/XPlane dumps;
* :func:`annotate` — named trace spans visible in the profile timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax

__all__ = ["steps_per_second", "trace", "annotate", "Timer"]


class Timer:
    """Accumulating wall-clock timer with device-sync semantics."""

    def __init__(self):
        self.elapsed = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0
        return False


def steps_per_second(
    fn: Callable[..., Any],
    *args: Any,
    steps_per_call: int,
    iters: int = 3,
    warmup: int = 1,
) -> float:
    """Measure env-steps/s of ``fn(*args)`` (jitted; any output pytree).

    Dispatch overhead is amortized by making ``fn`` cover many env steps
    (a ``lax.scan`` rollout); timing brackets with ``block_until_ready``.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return steps_per_call * iters / dt


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region to ``log_dir`` (TensorBoard/Perfetto readable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the profiler timeline (host + device)."""
    return jax.profiler.TraceAnnotation(name)
