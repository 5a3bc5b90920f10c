"""Profiling / tracing utilities (the reference has none — SURVEY §5).

Wraps `jax.profiler`: named trace annotations for the hot loops and an
optional TensorBoard trace dump around any callable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

__all__ = ["annotate", "trace", "Timer"]


def annotate(name: str):
    """Trace annotation context (shows up in xprof/TensorBoard timelines)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a device trace into `log_dir` (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that fences device work via device_get.

    NOTE: on this image's remote-TPU platform, block_until_ready returns
    before execution completes; fencing through a host transfer is the only
    reliable way to time device work (see bench.py).
    """

    def __init__(self):
        self.laps = []

    def time(self, fn: Callable, *args, iters: int = 1, warmup: int = 1):
        for _ in range(warmup):
            jax.device_get(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.device_get(fn(*args))
        dt = (time.perf_counter() - t0) / iters
        self.laps.append(dt)
        return dt, out
