"""Tracing / profiling / numerics-guard hooks.

The reference has no tracing beyond wall-clock meters (SURVEY §5). TPU-native
observability: jax.profiler device traces (viewable in TensorBoard/XProf),
honest step timing (block_until_ready), and NaN guards for the attack loop.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/geoa3_trace") -> Iterator[str]:
    """Capture a device profile around a block:

        with device_trace("/tmp/trace"):
            run_attack(...)

    Open the trace with TensorBoard's profile plugin.
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in device traces (jax.profiler.TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Raise on NaN-producing ops inside the block (jax debug_nans)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def timed(fn, *args, label: Optional[str] = None, **kwargs):
    """Run fn, block on all outputs, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    if label:
        print(f"[timed] {label}: {dt * 1000:.2f} ms")
    return out, dt
