"""Quickstart: the full SVS pipeline on synthetic audio, via the Python API.

Mirrors the reference's manual workflow (readme.md:20-35) end to end without
needing MUSDB18:

    songs -> to_spec -> train a few epochs -> whole-song separation -> wav
          -> BSS-eval metrics

Run:  python examples/quickstart.py [workdir]
"""

import os
import sys

# runnable as `python examples/quickstart.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svs_tpu.data import prep, wav as wavio
from svs_tpu.evaluation import bss
from svs_tpu.infer import separate
from svs_tpu.train.loop import TrainOptions, fit
from svs_tpu.utils.config import SVSConfig


def make_songs(root: str, n: int = 2, secs: float = 16.0, sr: int = 8192):
    # >= 12 s so songs exceed the 128-frame training patch and the random
    # crop path is actually exercised (65 frames would always zero-pad).
    # tests/test_cli.py builds similar folders; kept self-contained here —
    # both must follow the mixture.wav/vocals.wav song-folder contract.
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * secs)) / sr
    for i in range(n):
        d = os.path.join(root, f"song{i}")
        os.makedirs(d, exist_ok=True)
        vocal = 0.3 * np.sin(2 * np.pi * (440 + 60 * i) * t)
        accomp = 0.2 * np.sin(2 * np.pi * 130 * t) \
            + 0.05 * rng.standard_normal(len(t))
        wavio.write_wav(os.path.join(d, "vocals.wav"),
                        vocal.astype(np.float32), sr)
        wavio.write_wav(os.path.join(d, "mixture.wav"),
                        (vocal + accomp).astype(np.float32), sr)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "quickstart_out"
    cfg = SVSConfig(samples_per_song=8)
    songs = os.path.join(work, "songs")
    spec = os.path.join(work, "spec")
    os.makedirs(work, exist_ok=True)

    print("== 1. synthetic songs ==")
    make_songs(songs)

    print("== 2. wav -> spectrograms (on-device STFT) ==")
    prep.to_spec(songs, spec, win_size=cfg.window_size,
                 hop_size=cfg.hop_size, sr=cfg.sample_rate)

    print("== 3. train ==")
    state = fit(TrainOptions(
        train_folder=spec, valid_folder=spec, label="quickstart",
        epoch=3, batch_size=4, val_interval=1,
        ckpt_dir=os.path.join(work, "CKPT"),
        log_dir=os.path.join(work, "LOG"),
        load_path=os.path.join(work, "none"),
        progress=False,
    ), cfg)

    print("== 4. whole-song wav -> wav separation (one jitted graph) ==")
    mix, _ = wavio.load_audio(os.path.join(songs, "song0", "mixture.wav"),
                              sr=cfg.sample_rate)
    vocal_est = separate.separate_wav(state.params, state.bn_state, mix,
                                      cfg=cfg)
    out_wav = os.path.join(work, "song0_vocal.wav")
    wavio.write_wav(out_wav, vocal_est, cfg.sample_rate)
    print("wrote", out_wav)

    print("== 5. BSS-eval ==")
    vocal_ref, _ = wavio.load_audio(os.path.join(songs, "song0",
                                                 "vocals.wav"),
                                    sr=cfg.sample_rate)
    m = bss.compute_metrics_for_track(mix, vocal_ref, vocal_est)
    print({k: round(v, 3) for k, v in m.items()})


if __name__ == "__main__":
    main()
