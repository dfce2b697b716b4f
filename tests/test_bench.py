"""Bench surface: the train-step microbench produces sane numbers on the
CPU mesh (the driver's bench.py carries the same fields, measured on TPU)."""

import dataclasses

import numpy as np

from svs_tpu.utils.benchmark import train_step_bench
from svs_tpu.utils.config import SVSConfig


def test_train_step_bench_fields():
    cfg = dataclasses.replace(SVSConfig(), input_len=64)
    out = train_step_bench(cfg, batch_size=2, steps=2)
    assert out["train_batch"] == 2
    assert out["train_step_ms"] > 0
    assert np.isfinite(out["train_steps_per_sec"])
    # XLA's CPU backend reports cost analysis too; if it ever stops, the
    # field degrades to None rather than failing the bench
    if out["train_flops_per_step"] is not None:
        assert out["train_flops_per_step"] > 1e6
