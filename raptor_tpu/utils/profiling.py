"""Tracing / profiling hooks (SURVEY.md §5.1).

``jax.profiler`` traces (Perfetto/XPlane) around solves, and
``jax.named_scope`` annotations per phase so V-cycle phases are attributable
in the trace.  Timing fences (``block_until_ready``) appear only in bench
mode, never on the solve path (BASELINE.json:5 no host round-trips).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["trace", "phase", "timed"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace around a block: view in Perfetto/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def phase(name: str):
    """Named scope for a setup/solve phase (shows up in traces)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def timed(label: str, sink: dict | None = None) -> Iterator[None]:
    """Wall-time a block with a device fence (bench-mode only)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = sink.get(label, 0.0) + dt
