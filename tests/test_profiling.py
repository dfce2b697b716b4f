"""Observability subsystem tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.utils import profiling


def test_step_timer_summary():
    t = profiling.StepTimer(warmup=1)
    import time
    for _ in range(5):
        with t.step():
            time.sleep(0.002)
    s = t.summary()
    assert s["steps"] == 4
    assert 1.0 < s["mean_ms"] < 100.0
    assert s["p50_ms"] <= s["p90_ms"] <= s["max_ms"]


def test_step_timer_empty():
    assert profiling.StepTimer().summary() == {"steps": 0}


def test_debug_nans_catches():
    @jax.jit
    def bad(x):
        return jnp.log(x)  # log(-1) -> nan

    with profiling.debug_nans():
        with pytest.raises(FloatingPointError):
            np.asarray(bad(jnp.asarray(-1.0)))
    # restored afterwards: nan flows silently again
    assert np.isnan(np.asarray(bad(jnp.asarray(-1.0))))


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        np.asarray(jnp.arange(8) * 2)
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found  # profiler wrote a trace artifact


def test_annotate_noop_smoke():
    with profiling.annotate("phase"):
        np.asarray(jnp.ones(4) + 1)


def test_device_memory_stats_dict():
    s = profiling.device_memory_stats()
    assert isinstance(s, dict)


def test_fetch_barrier_and_time_amortized():
    """The single-home timing barrier: fetch_barrier returns a float drawn
    from the tree's first leaf; time_amortized times a callable in ms."""
    import jax.numpy as jnp

    from svs_tpu.utils.profiling import fetch_barrier, time_amortized

    v = fetch_barrier({"a": jnp.arange(6.0).reshape(2, 3) + 7.0})
    assert isinstance(v, float) and v == 7.0
    assert fetch_barrier(jnp.float32(3.5)) == 3.5

    ms = time_amortized(lambda x: x * 2, jnp.ones((4,)), reps=5)
    assert isinstance(ms, float) and ms >= 0.0
