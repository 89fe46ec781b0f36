"""Profiling & metrics.

The reference's only instrumentation is wall-clock brackets + a nominal
kRay/s print (SURVEY §5).  Here:
  * ``trace()`` context manager wraps a region in a ``jax.profiler`` trace
    (view with TensorBoard / xprof) — per-kernel timing on real hardware;
  * ``RayStats`` accumulates honest segment counts (bounce rays included)
    and derives Mrays/s;
  * ``timed()`` convenience for wall-clock brackets with block_until_ready.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a region (writes xplane protos to log_dir)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {(time.perf_counter() - t0) * 1000:.1f} ms")


@dataclasses.dataclass
class RayStats:
    """Honest throughput accounting (vs the reference's primary-only
    ``W*H*spp/ms`` at main.cpp:50-53, which ignores bounces and adaptive
    skipping)."""

    segments: int = 0
    seconds: float = 0.0

    def add(self, segments: int, seconds: float):
        self.segments += int(segments)
        self.seconds += seconds

    @property
    def mrays_per_s(self) -> float:
        return self.segments / self.seconds / 1e6 if self.seconds else 0.0
