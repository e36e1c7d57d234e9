"""util/profiling: phase accounting + jax.profiler trace context."""

import os
import time

import jax
import jax.numpy as jnp

from mobocmf_tpu.util.profiling import (
    phase_report,
    phase_timer,
    reset_phase_times,
    trace,
)


def test_phase_timer_accumulates_and_blocks():
    reset_phase_times()
    with phase_timer("unit_sleep", verbose=False):
        time.sleep(0.05)
    x = jnp.ones((64, 64))
    with phase_timer("unit_matmul", result=x, verbose=False):
        x = x @ x
    rep = phase_report()
    assert rep["unit_sleep"]["count"] == 1
    assert rep["unit_sleep"]["total_s"] >= 0.05
    assert "unit_matmul" in rep
    with phase_timer("unit_sleep", verbose=False):
        time.sleep(0.01)
    assert phase_report()["unit_sleep"]["count"] == 2
    reset_phase_times()
    assert phase_report() == {}


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        jnp.ones((16, 16)).block_until_ready()
    # jax.profiler writes a plugins/profile/<ts>/ tree
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "trace context produced no profile files"
