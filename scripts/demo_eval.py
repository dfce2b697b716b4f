"""Evaluate a (possibly interrupted) convergence-demo run from its latest
checkpoint: loss trajectory from the text log + held-out SDR/NSDR.

Run:  python scripts/demo_eval.py <workdir> [ckpt] [dtype]
Complements scripts/convergence_demo.py — a run cut by a wall-clock limit
still has per-`save_every` checkpoints; this reproduces the summary the
demo would have printed (reference workflow: train -> separate -> evaluate).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svs_tpu.data import wav as wavio
from svs_tpu.evaluation import bss
from svs_tpu.infer import separate
from svs_tpu.train import checkpoint as ckpt_lib
from svs_tpu.train.step import create_train_state
from svs_tpu.utils.config import SVSConfig

import dataclasses
import jax


def main():
    work = sys.argv[1]
    ckpt = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        work, "CKPT", "svs_demo.ckpt")
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    cfg = dataclasses.replace(SVSConfig(), compute_dtype=dtype)
    sr = cfg.sample_rate

    template = create_train_state(jax.random.key(0), cfg)
    state, epoch, extras = ckpt_lib.resume(ckpt, template)

    log = os.path.join(work, "LOG", "log_demo.txt")
    train_losses, val_losses = [], []
    with open(log) as f:
        for line in f:
            if line.startswith("Val"):
                val_losses.append(float(line.split()[1]))
            elif line.strip():
                train_losses.append(float(line.strip()))

    # a run interrupted before its first full epoch has an empty log; an
    # epoch-0 checkpoint predates any logged loss — report None, not the
    # last logged value
    results = {"ckpt_epoch": epoch, "compute_dtype": cfg.compute_dtype,
               "loss_first": train_losses[0] if train_losses else None,
               "loss_at_ckpt": train_losses[min(epoch, len(train_losses)) - 1]
               if train_losses and epoch > 0 else None,
               "val_best": min(val_losses) if val_losses else None,
               "per_song": []}

    test_dir = os.path.join(work, "songs", "test")
    for song in sorted(os.listdir(test_dir)):
        mix, _ = wavio.load_audio(os.path.join(test_dir, song, "mixture.wav"),
                                  sr=sr)
        ref, _ = wavio.load_audio(os.path.join(test_dir, song, "vocals.wav"),
                                  sr=sr)
        est = separate.separate_wav(state.params, state.bn_state, mix,
                                    cfg=cfg)
        m = bss.compute_metrics_for_track(mix, ref, est)
        results["per_song"].append(
            {"song": song, "sdr": round(m["SDR"], 2),
             "nsdr": round(m["NSDR"], 2)})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
