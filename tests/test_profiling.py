"""Profiling utility tests."""

import time

import jax.numpy as jnp

from tpu_nbody import profiling


def test_phase_timer_accumulates():
    pt = profiling.PhaseTimer()
    for _ in range(3):
        with pt("work") as h:
            x = jnp.arange(16.0) * 2
            time.sleep(0.01)
            h["result"] = x
    assert pt.counts["work"] == 3
    assert pt.totals["work"] >= 0.03
    assert "work" in pt.report()


def test_meter_rate():
    m = profiling.Meter()
    m._t0 = time.time() - 2.0  # force window rollover
    rate = m.tick(500)
    assert 200 < rate < 300  # 500 units over ~2s


def test_trace_noop_fallback(tmp_path):
    with profiling.trace(str(tmp_path / "trace")):
        x = jnp.ones((4,)) + 1
    assert float(x[0]) == 2.0


def test_sync_forces_completion():
    x = jnp.arange(1024.0)
    profiling.sync({"a": x * 2})  # must not raise on pytrees
