"""Profiling helpers: jax.profiler traces + phase counters.

The reference's observability is commented-out wall-clock probes
(PathNet_run.py:316-396); here tracing is first-class: a context manager
that captures an XLA/TPU trace viewable in TensorBoard/Perfetto, plus
throughput counters (paths/s, epochs/s) derived from Timer phases.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pathnet_tpu_trace",
          host_tracer_level: int = 2) -> Iterator[str]:
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling throughput counter: items/s over a sliding window."""

    def __init__(self, unit: str = "paths"):
        self.unit = unit
        self.t0 = time.perf_counter()
        self.items = 0

    def add(self, n: int) -> None:
        self.items += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.items / dt if dt > 0 else 0.0

    def report(self) -> str:
        return f"{self.rate():,.0f} {self.unit}/s"
