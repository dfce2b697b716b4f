"""End-to-end throughput benchmark (shared by bench.py and the svs-bench CLI).

Headline metric (BASELINE.json): spectrogram frames/sec through the fused
wav -> STFT -> U-Net mask -> iSTFT -> wav decode path on one chip, with the
north-star bar at 50x realtime.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def run_bench(secs: float = 240.0, reps: int = 5, seed: int = 0,
              cfg=None, compute_dtype: Optional[str] = None) -> Dict:
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

    out = separate.separate_wav(params, bn_state, y, cfg=cfg)  # compile
    assert out.shape == y.shape and np.isfinite(out).all()

    t0 = time.perf_counter()
    for _ in range(reps):
        out = separate.separate_wav(params, bn_state, y, cfg=cfg)
    elapsed = (time.perf_counter() - t0) / reps

    n_frames = 1 + n // cfg.hop_size
    frames_per_sec = n_frames / elapsed
    realtime = secs / elapsed
    target_fps = 50.0 * cfg.sample_rate / cfg.hop_size

    return {
        "metric": "e2e_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": f"frames/s (= {realtime:.0f}x realtime, wav->unet-mask->wav)",
        "vs_baseline": round(frames_per_sec / target_fps, 2),
    }
