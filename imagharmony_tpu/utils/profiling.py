"""Profiling/tracing helpers (the reference has only wall-clock prints,
reference train.py:621-623; SURVEY.md §5 asks for real tracing here).

Usage:
    with profiling.trace("/tmp/jax-trace"):      # perfetto-compatible dump
        pipe.generate(...)

    with profiling.annotate("denoise-loop"):
        ...

    stats = profiling.compiled_stats(jitted_fn, *args)   # flops / bytes
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    return jax.profiler.TraceAnnotation(name)


def compiled_stats(fn, *args, **kwargs):
    """Compile fn and report XLA's cost analysis (flops, bytes, peak mem)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    try:
        mem = compiled.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", None)
    except Exception:
        peak = None
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "peak_temp_bytes": peak,
    }


class StepTimer:
    """Rolling step timer with device-sync, for train loops."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.history = []

    def lap(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        self.history.append(dt)
        return dt

    @property
    def mean(self):
        return sum(self.history) / max(len(self.history), 1)
