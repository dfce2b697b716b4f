"""End-to-end throughput benchmark (shared by bench.py and the svs-bench CLI).

Headline metric (BASELINE.json): spectrogram frames/sec through the fused
wav -> STFT -> U-Net mask -> iSTFT -> wav decode path on one chip, with the
north-star bar at 50x realtime.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

# bf16 MXU peak FLOPs/s per chip by device kind (public spec sheets); used as
# the MFU denominator.  f32 conv compute on v5e+ is emulated on the bf16 MXU,
# so bf16 peak is the honest ceiling either way.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _device_peak_flops() -> Optional[float]:
    import jax

    kind = jax.devices()[0].device_kind
    # LONGEST matching prefix, so "TPU v5 lite" beats "TPU v5" regardless of
    # dict order (a plain first-match loop silently computed a v5e's MFU
    # against the v5p peak if the table was ever reordered)
    hits = [(len(name), peak) for name, peak in _PEAK_FLOPS.items()
            if kind.startswith(name)]
    return max(hits)[1] if hits else None


def train_step_bench(cfg=None, batch_size: int = 32, steps: int = 100,
                     seed: int = 0) -> Dict:
    """Single-chip training-step throughput at the documented batch size
    (reference train.py:396 uses B=32): ms/step, steps/s, and MFU against the
    chip's bf16 peak (BASELINE.json config #4 'train-step parity/throughput').
    """
    import jax

    from svs_tpu.train.step import create_train_state, make_train_step
    from svs_tpu.utils.config import SVSConfig

    cfg = cfg or SVSConfig()
    rng = np.random.default_rng(seed)
    shape = (batch_size, cfg.freq_bins, cfg.input_len)
    batch = {
        "mix": jax.device_put(rng.random(shape, np.float32)),
        "voc": jax.device_put(rng.random(shape, np.float32) * 0.5),
        "mix_angle": jax.device_put(
            ((rng.random(shape, np.float32) - 0.5) * 6.0)),
        "voc_angle": jax.device_put(
            ((rng.random(shape, np.float32) - 0.5) * 6.0)),
    }
    state = create_train_state(jax.random.key(0), cfg)
    step = make_train_step(cfg)

    # AOT-compile once; the same executable provides the analytic FLOPs
    # (includes the loss's STFT matmuls, the backward pass and the Adam
    # update) AND runs the timed steps — no second jit compilation.
    key = jax.random.key(2)
    compiled = step.lower(state, batch, key).compile()
    try:
        cost = compiled.cost_analysis()
        flops_per_step = float(cost.get("flops", 0.0)) or None
    except Exception:
        flops_per_step = None
    step = compiled

    from svs_tpu.utils.profiling import fetch_barrier

    state, aux = step(state, batch, key)  # first run
    fetch_barrier(aux["total"])

    # best-of-3 like the streaming bench: tunnel rigs fluctuate.  The
    # end-of-burst barrier is fetch_barrier (NOT block_until_ready — see its
    # docstring); the fetched scalar data-depends on the whole burst because
    # state chains step->step.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, aux = step(state, batch, key)
        fetch_barrier(aux["total"])
        best = min(best, (time.perf_counter() - t0) / steps)

    peak = _device_peak_flops()
    mfu = (flops_per_step / best / peak * 100.0
           if flops_per_step and peak else None)
    return {
        "train_step_ms": round(best * 1e3, 2),
        "train_steps_per_sec": round(1.0 / best, 2),
        "train_batch": batch_size,
        "train_flops_per_step": flops_per_step,
        "train_mfu_pct": round(mfu, 2) if mfu is not None else None,
    }


def run_bench(secs: float = 240.0, reps: int = 8, seed: int = 0,
              cfg=None, compute_dtype: Optional[str] = None,
              pcm16: bool = True, train: bool = True) -> Dict:
    """Sustained streaming separation of ``reps`` songs of ``secs`` seconds:
    the serving configuration (PCM16 wavs in/out, on-device decode, software-
    pipelined transfers, BASELINE.json config 'multi-song batched streaming
    inference').  With ``train=True`` the returned line also carries the
    training-step throughput fields (BASELINE.json config #4) from
    :func:`train_step_bench`."""
    import jax

    from svs_tpu.infer import separate
    from svs_tpu.models import unet
    from svs_tpu.utils.config import SVSConfig

    cfg = cfg or SVSConfig()
    if compute_dtype:
        import dataclasses
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    params, bn_state = unet.init(jax.random.key(0), cfg)

    n = int(cfg.sample_rate * secs)
    rng = np.random.default_rng(seed)
    # a music-like fixture rather than white noise: harmonic "vocal" with
    # vibrato + low "accompaniment" + noise floor, so the PCM16 quantise
    # path and the mask see a realistic magnitude distribution (throughput
    # itself is shape-dependent only)
    t = np.arange(n, dtype=np.float64) / cfg.sample_rate
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    y = (0.3 * np.sin(2 * np.pi * 440.0 * vib * t)
         + 0.15 * np.sin(2 * np.pi * 880.0 * t)
         + 0.2 * np.sin(2 * np.pi * 130.0 * t)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
    if pcm16:
        y = (y * 32768.0).clip(-32768, 32767).astype(np.int16)

    out = separate.separate_wav_stream(params, bn_state, [y], cfg=cfg,
                                       pcm16=pcm16)  # compile
    assert out[0].shape == y.shape and np.isfinite(
        out[0].astype(np.float32)).all()

    # best-of-3: the host<->device link on tunnelled test rigs fluctuates
    # several-fold minute to minute; best-of reflects the machine, not the
    # weather
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = separate.separate_wav_stream(params, bn_state, [y] * reps,
                                            cfg=cfg, pcm16=pcm16)
        elapsed = min(elapsed, (time.perf_counter() - t0) / reps)
        assert len(outs) == reps

    n_frames = 1 + n // cfg.hop_size
    frames_per_sec = n_frames / elapsed
    realtime = secs / elapsed
    target_fps = 50.0 * cfg.sample_rate / cfg.hop_size

    result = {
        "metric": "e2e_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": (f"frames/s (= {realtime:.0f}x realtime; streaming "
                 "wav->stft->unet-mask->istft->wav, "
                 f"{'pcm16' if pcm16 else 'f32'} host I/O)"),
        "vs_baseline": round(frames_per_sec / target_fps, 2),
    }
    if train:
        try:
            result.update(train_step_bench(cfg))
        except Exception as e:  # the headline metric must survive regardless
            result["train_bench_error"] = repr(e)
    return result
