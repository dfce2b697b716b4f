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


def test_decode_device_bench_fields():
    """Chip-resident decode bench runs and reports coherent fields (tiny
    geometry on CPU; the driver measures the same fields on TPU)."""
    from svs_tpu.utils.benchmark import decode_device_bench

    cfg = dataclasses.replace(SVSConfig(), input_len=64)
    out = decode_device_bench(cfg=cfg, secs=2.0, reps=2)
    assert out["decode_device_ms_per_song"] > 0
    assert out["decode_device_frames_per_sec"] > 0
    # frames/s consistent with ms/song
    n_frames = 1 + int(cfg.sample_rate * 2.0) // cfg.hop_size
    want = n_frames / (out["decode_device_ms_per_song"] / 1e3)
    np.testing.assert_allclose(out["decode_device_frames_per_sec"], want,
                               rtol=0.01)


def test_train_epoch_bench_fields():
    """End-to-end epoch bench: real PatchDataset + host pipeline + step."""
    from svs_tpu.utils.benchmark import train_epoch_bench

    cfg = dataclasses.replace(SVSConfig(), input_len=64, samples_per_song=4)
    out = train_epoch_bench(cfg, batch_size=4, n_songs=2, song_frames=150,
                            epochs=1)
    assert out["train_epoch_secs"] > 0
    assert out["train_epoch_patches"] == 8  # 2 songs * 4 samples/song
    # fields are rounded to 1 decimal, so allow the rounding slack
    np.testing.assert_allclose(
        out["train_patches_per_sec"],
        out["train_epoch_patches"] / out["train_epoch_secs"], rtol=0.1)


def test_train_epoch_bench_device_resident():
    """Same bench through the HBM-resident pipeline: suffixed fields."""
    from svs_tpu.utils.benchmark import train_epoch_bench

    cfg = dataclasses.replace(SVSConfig(), input_len=64, samples_per_song=4)
    out = train_epoch_bench(cfg, batch_size=4, n_songs=2, song_frames=150,
                            epochs=1, device_resident=True)
    assert out["train_epoch_device_secs"] > 0
    assert out["train_epoch_device_patches"] == 8
    assert out["train_patches_per_sec_device"] > 0


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
