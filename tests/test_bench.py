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


def test_device_peak_flops_longest_prefix():
    """MFU denominator matching is longest-prefix, independent of table
    order: 'TPU v5 lite' must never resolve to the 'TPU v5' (v5p) peak."""
    from unittest import mock

    from svs_tpu.utils import benchmark as bm

    class _Dev:
        def __init__(self, kind):
            self.device_kind = kind

    def peak_for(kind):
        import jax as _jax
        with mock.patch.object(_jax, "devices",
                               lambda *a, **k: [_Dev(kind)]):
            return bm._device_peak_flops()

    assert peak_for("TPU v5 lite") == bm._PEAK_FLOPS["TPU v5 lite"]
    assert peak_for("TPU v5") == bm._PEAK_FLOPS["TPU v5"]
    assert peak_for("TPU v5p chip") == bm._PEAK_FLOPS["TPU v5p"]
    assert peak_for("TPU v6e something") == bm._PEAK_FLOPS["TPU v6e"]
    assert peak_for("Colossus") is None
    # order-independence: reversed table gives the same answers
    reversed_table = dict(reversed(list(bm._PEAK_FLOPS.items())))
    with mock.patch.object(bm, "_PEAK_FLOPS", reversed_table):
        assert peak_for("TPU v5 lite") == reversed_table["TPU v5 lite"]
