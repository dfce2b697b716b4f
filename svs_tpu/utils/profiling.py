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
