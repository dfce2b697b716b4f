"""End-to-end throughput benchmark (shared by bench.py and the svs-bench CLI).

Headline metric (BASELINE.json): spectrogram frames/sec through the fused
wav -> STFT -> U-Net mask -> iSTFT -> wav decode path on one chip, with the
north-star bar at 50x realtime.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def run_bench(secs: float = 240.0, reps: int = 8, seed: int = 0,
              cfg=None, compute_dtype: Optional[str] = None,
              pcm16: bool = True) -> Dict:
    """Sustained streaming separation of ``reps`` songs of ``secs`` seconds:
    the serving configuration (PCM16 wavs in/out, on-device decode, software-
    pipelined transfers, BASELINE.json config 'multi-song batched streaming
    inference')."""
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
    y = (rng.standard_normal(n) * 0.1).astype(np.float32)
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

    return {
        "metric": "e2e_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": (f"frames/s (= {realtime:.0f}x realtime; streaming "
                 "wav->stft->unet-mask->istft->wav, "
                 f"{'pcm16' if pcm16 else 'f32'} host I/O)"),
        "vs_baseline": round(frames_per_sec / target_fps, 2),
    }
