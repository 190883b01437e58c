"""Profiling / tracing helpers.

The reference's only instrumentation is wall-clock brackets and progress
prints (BER_simulation_OpenCL.py:97,107-126). Here the per-SNR structured
results (sim.engine.PointResult) carry the throughput numbers, and this
module adds the device-level view: an optional ``jax.profiler`` trace
around any region, viewable in TensorBoard/XProf (per-kernel timings,
HBM traffic, fusion boundaries).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Wrap a region in a jax.profiler trace when ``trace_dir`` is set."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def wallclock(label: str, sink=print):
    """Wall-clock bracket, the reference's ``time.time()`` idiom."""
    t0 = time.time()
    yield
    sink(f"{label}: {time.time() - t0:.3f} s")
