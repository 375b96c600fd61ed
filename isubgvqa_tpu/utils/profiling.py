"""Profiling hooks.

The reference has no tracing/profiling beyond wall-clock meters
(SURVEY §5); this adds the TPU-native story: ``jax.profiler`` traces
around training steps plus simple step timers, opt-in and zero-cost
when disabled.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in XProf/TensorBoard.

    Enabled when a directory is given or ``ISUBGVQA_TRACE_DIR`` is set.
    """
    log_dir = log_dir or os.environ.get("ISUBGVQA_TRACE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Per-step wall-clock + device-memory sampling."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: list[float] = []
        self._t0 = time.perf_counter()

    def step(self):
        if not self.enabled:
            return
        now = time.perf_counter()
        self.times.append(now - self._t0)
        self._t0 = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times[1:] or self.times)
        stats = {}
        try:
            mem = jax.local_devices()[0].memory_stats() or {}
            stats["peak_bytes"] = mem.get("peak_bytes_in_use")
        except Exception:
            pass
        stats.update(mean_s=float(arr.mean()), p50_s=float(np.median(arr)),
                     p95_s=float(np.percentile(arr, 95)))
        return stats
