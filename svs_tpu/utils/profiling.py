"""Tracing / profiling / numerics-debugging subsystem.

The reference has NO profiling or sanitizer support (SURVEY.md §5: the only
visibility is tqdm bars, train.py:248).  The TPU build supplies:

- :func:`trace` — ``jax.profiler`` trace context writing TensorBoard-loadable
  traces (XLA op-level timeline on TPU)
- :class:`StepTimer` — per-step wall-time stats with warmup discard and
  percentile summary (the per-step analogue of the reference's tqdm postfix,
  train.py:307-311, but measurable)
- :func:`debug_nans` — JAX's functional model has no data races to sanitize
  (SURVEY.md §5 'race detection'); the numerics analogue is NaN detection,
  toggled here via ``jax.config`` (jax_debug_nans)
- :func:`annotate` — named profiler spans (``jax.profiler.TraceAnnotation``)
  so framework phases show up in traces
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped NaN checking: any jit/op producing NaN raises immediately
    (re-runs the offending op un-jitted for a precise traceback)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Wall-clock step timing with compile-warmup discard.

    NOTE (axon rigs): wrap work that ends in a VALUE FETCH (``float(loss)``)
    — on the axon remote platform ``jax.block_until_ready`` returns before
    device execution finishes, so timing un-fetched dispatches measures
    host-side dispatch only (see scripts/profile_step.py methodology).

    >>> t = StepTimer(warmup=1)
    >>> for batch in batches:
    ...     with t.step():
    ...         state, aux = train_step(state, batch, rng)
    >>> t.summary()   # {'steps': ..., 'mean_ms': ..., 'p50_ms': ...}
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._all: List[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self._all.append(time.perf_counter() - t0)

    @property
    def times(self) -> List[float]:
        return self._all[self.warmup:]

    def summary(self) -> Dict[str, float]:
        ts = self.times
        if not ts:
            return {"steps": 0}
        ms = sorted(t * 1e3 for t in ts)
        return {
            "steps": len(ms),
            "mean_ms": statistics.fmean(ms),
            "p50_ms": ms[len(ms) // 2],
            "p90_ms": ms[int(len(ms) * 0.9)],
            "max_ms": ms[-1],
        }


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict:
    """Best-effort live/peak HBM stats (not all backends implement it)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {k: stats[k] for k in
            ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
            if k in stats}


def fetch_barrier(tree) -> float:
    """REAL completion barrier for timing: fetch a scalar that data-depends
    on ``tree``.

    On remote/tunnelled platforms (axon) ``jax.block_until_ready`` returns
    before device execution finishes — it "times" a 1.1-TFLOP matmul at
    0.025 ms (see docs/ROUND_NOTES.md round-2 methodology).  Fetching a
    value from the LAST result forces execution of it and, the device queue
    being FIFO, of everything enqueued before it.  One fetch costs a tunnel
    round-trip (~40 ms here), so timed loops should amortise it over >=100
    reps.  This is THE single home of that workaround — benches must call
    this, not hand-roll ``block_until_ready``.
    """
    leaf = jax.tree.leaves(tree)[0]
    return float(leaf[(0,) * leaf.ndim])


def time_amortized(f, *args, reps: int = 100) -> float:
    """Milliseconds per call of ``f(*args)``: one warmup call, ``reps`` timed
    calls, closed by a :func:`fetch_barrier` on the final result so the whole
    burst is actually executed (not just dispatched)."""
    fetch_barrier(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    fetch_barrier(r)
    return (time.perf_counter() - t0) / reps * 1e3
