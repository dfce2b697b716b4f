"""End-to-end benchmark: full-song separation throughput on one chip.

Measures the BASELINE.json headline: spectrogram frames/sec through the fused
STFT -> U-Net mask -> iSTFT decode path (wav in, separated wav out), on a
synthetic 4-minute song at the reference's 8192 Hz.  vs_baseline is measured
against the driver's north-star bar of 50x realtime per chip
(= 50 * SAMPLE_RATE / HOP_SIZE ~ 533 frames/s).

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from svs_tpu.infer import separate
    from svs_tpu.models import unet
    from svs_tpu.utils.config import SVSConfig

    cfg = SVSConfig()
    params, bn_state = unet.init(jax.random.key(0), cfg)

    secs = 240.0
    n = int(cfg.sample_rate * secs)
    rng = np.random.default_rng(0)
    y = (rng.standard_normal(n) * 0.1).astype(np.float32)

    # warmup / compile
    out = separate.separate_wav(params, bn_state, y, cfg=cfg)
    assert out.shape == y.shape and np.isfinite(out).all()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = separate.separate_wav(params, bn_state, y, cfg=cfg)
    elapsed = (time.perf_counter() - t0) / reps

    n_frames = 1 + n // cfg.hop_size
    frames_per_sec = n_frames / elapsed
    realtime = secs / elapsed
    target_fps = 50.0 * cfg.sample_rate / cfg.hop_size  # 50x realtime bar

    print(json.dumps({
        "metric": "e2e_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": f"frames/s (= {realtime:.0f}x realtime, wav->unet-mask->wav)",
        "vs_baseline": round(frames_per_sec / target_fps, 2),
    }))


if __name__ == "__main__":
    # keep stdout clean for the JSON line
    import logging
    logging.disable(logging.WARNING)
    main()
