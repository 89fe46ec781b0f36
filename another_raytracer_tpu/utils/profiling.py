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


def module_device_seconds(logdir: str) -> float:
    """Total XLA-module DEVICE span in the newest trace under ``logdir``.

    The honest substrate for grad-step timing on this tunnel: CLAUDE.md
    rule 13 — ``block_until_ready`` on small (grad-sized) outputs can
    return before device work completes, so sub-millisecond walls lie.
    Shared by scripts/roofline.py, trace_probe and bench.py.
    """
    import glob
    import gzip
    import json

    files = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    tr = json.loads(gzip.open(files[-1]).read())
    events = tr["traceEvents"]
    dev_pid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e.get("args", {}).get("name", ""):
            dev_pid = e["pid"]
    tidname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("pid") == dev_pid \
                and e.get("name") == "thread_name":
            tidname[e["tid"]] = e["args"]["name"]
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") == dev_pid \
                and tidname.get(e.get("tid")) == "XLA Modules":
            total += e["dur"]
    return total / 1e6
