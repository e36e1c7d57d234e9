"""Tracing / profiling (first-class, unlike the reference's print-only logs).

`phase_timer` wraps a pipeline phase with wall-clock accounting (blocking on
device results so times are honest); `trace` exposes jax.profiler traces for
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

_PHASE_TIMES: Dict[str, float] = defaultdict(float)
_PHASE_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str, result=None, verbose: bool = True):
    t0 = time.perf_counter()
    yield
    if result is not None:
        jax.block_until_ready(result)
    dt = time.perf_counter() - t0
    _PHASE_TIMES[name] += dt
    _PHASE_COUNTS[name] += 1
    if verbose:
        print(f"[timing] {name}: {dt:.3f}s")


def phase_report() -> Dict[str, float]:
    return {
        k: {"total_s": _PHASE_TIMES[k], "count": _PHASE_COUNTS[k]}
        for k in _PHASE_TIMES
    }


def reset_phase_times():
    _PHASE_TIMES.clear()
    _PHASE_COUNTS.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
