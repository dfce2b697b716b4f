"""Chip cost of the remix augmentation (data/augment.py) at B=32.

Measures, fetch-barrier methodology (docs/ROUND_NOTES.md round-2):
  1. the jitted apply_remix transform alone (amortised ms/call)
  2. 100 train steps WITH per-step host draw + augment vs WITHOUT

Run on the real TPU:  python scripts/bench_augment.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from svs_tpu.data.augment import Augmenter
from svs_tpu.train.step import create_train_state, make_train_step
from svs_tpu.utils.config import get_config
from svs_tpu.utils.profiling import fetch_barrier


def main(batch_size=32, reps=100):
    import svs_tpu
    svs_tpu.enable_compile_cache()
    cfg = get_config("default")
    rng = np.random.default_rng(0)
    shape = (batch_size, cfg.freq_bins, cfg.input_len)
    batch = {
        "mix": jax.device_put(rng.random(shape, np.float32)),
        "voc": jax.device_put(rng.random(shape, np.float32) * 0.5),
        "mix_angle": jax.device_put((rng.random(shape, np.float32) - 0.5) * 6),
        "voc_angle": jax.device_put((rng.random(shape, np.float32) - 0.5) * 6),
    }
    state = create_train_state(jax.random.key(0), cfg)
    step = make_train_step(cfg)
    key = jax.random.key(2)

    aug = Augmenter(remix_p=0.7).for_epoch(0)

    # warm both programs (remote compile paid here)
    t0 = time.perf_counter()
    state, aux = step(state, batch, key)
    fetch_barrier(aux["total"])
    print(f"step warm (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    fetch_barrier(aug(batch)["mix"])
    print(f"augment warm (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    # 1. transform alone, amortised
    t0 = time.perf_counter()
    out = batch
    for _ in range(reps):
        out = aug(out)
    fetch_barrier(out["mix"])
    ms_aug = (time.perf_counter() - t0) / reps * 1e3
    print(f"apply_remix alone: {ms_aug:.3f} ms/call (incl. host draw + "
          f"3x({batch_size},) vector upload)", flush=True)

    # 2. train step with vs without augmentation
    for label, use_aug in (("plain", False), ("augmented", True)):
        # the step donates its state argument — each arm needs its own
        s = create_train_state(jax.random.key(1), cfg)
        t0 = time.perf_counter()
        for _ in range(reps):
            b = aug(batch) if use_aug else batch
            s, aux = step(s, b, key)
        fetch_barrier(aux["total"])
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"train step {label}: {ms:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
