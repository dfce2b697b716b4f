"""Full-stack convergence demo on real hardware.

Drives the complete pipeline the way a user would (reference readme.md:20-35
workflow), on synthetic multi-voice songs, and writes a JSON summary:

    songs -> to_spec (Pallas front-end) -> fit() with validation, best-ckpt,
    async save + .pth export -> whole-song & segment-mode separation ->
    BSS-eval SDR/NSDR -> spectrogram diff figure

Run:  python scripts/convergence_demo.py [workdir] [epochs] [tokens...]

Optional tokens (any order): a compute dtype ("float32" / "bfloat16") —
used for the bf16-as-default A/B gate (VERDICT r2 next #2); "remat" to
turn on backward-pass rematerialisation; "augment" to enable the
on-device remix augmentation (data/augment.py) — used for the
augmentation-effect A/B (round 4); "scan" for the whole-epoch-in-one-jit
path (train/scan.py).

The songs are constructed so separation is learnable but not trivial:
vocals are vibrato'd harmonic stacks with onsets/offsets, accompaniment is
a chord progression plus filtered noise, and each split uses different
pitches/seeds (train generalises, not memorises).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svs_tpu.data import prep, wav as wavio
from svs_tpu.evaluation import bss
from svs_tpu.infer import separate
from svs_tpu.train.loop import TrainOptions, fit
from svs_tpu.utils.config import SVSConfig


def synth_song(rng, sr, secs, base_hz):
    """vocal = vibrato harmonic stack with note on/offs; accomp = chords+noise."""
    n = int(sr * secs)
    t = np.arange(n) / sr
    # vocal: 3 harmonics, 5 Hz vibrato, amplitude envelope with "phrases"
    vib = 1.0 + 0.012 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 6))
    env = 0.5 + 0.5 * np.clip(np.sin(2 * np.pi * 0.25 * t
                                     + rng.uniform(0, 6)), 0.0, None)
    vocal = env * (
        0.30 * np.sin(2 * np.pi * base_hz * vib * t)
        + 0.12 * np.sin(2 * np.pi * 2 * base_hz * vib * t + 0.5)
        + 0.06 * np.sin(2 * np.pi * 3 * base_hz * vib * t + 1.1)
    )
    # accompaniment: root-fifth-octave chord on a different root + pink-ish noise
    root = base_hz * rng.choice([0.25, 0.3, 0.375])
    accomp = (0.20 * np.sin(2 * np.pi * root * t)
              + 0.10 * np.sin(2 * np.pi * 1.5 * root * t + 0.3)
              + 0.08 * np.sin(2 * np.pi * 2.0 * root * t + 0.9))
    noise = rng.standard_normal(n)
    # one-pole lowpass -> pink-ish floor
    for _ in range(1):
        noise = np.convolve(noise, np.ones(8) / 8.0, mode="same")
    accomp = accomp + 0.03 * noise
    return vocal.astype(np.float32), accomp.astype(np.float32)


def make_split(root, n_songs, sr, secs, seed, pitches):
    rng = np.random.default_rng(seed)
    for i in range(n_songs):
        d = os.path.join(root, f"song{i}")
        os.makedirs(d, exist_ok=True)
        vocal, accomp = synth_song(rng, sr, secs, pitches[i % len(pitches)])
        wavio.write_wav(os.path.join(d, "vocals.wav"), vocal, sr)
        wavio.write_wav(os.path.join(d, "mixture.wav"), vocal + accomp, sr)


def prep_splits(work, cfg):
    """Synthesize the demo's train/valid/test songs and run to_spec on each
    split — the fixed dataset every on-chip A/B in this repo trains on."""
    sr = cfg.sample_rate
    splits = {"train": (6, 30.0, 1, (392.0, 440.0, 494.0, 523.0, 587.0,
                                     659.0)),
              "valid": (2, 20.0, 2, (415.0, 554.0)),
              "test": (2, 20.0, 3, (466.0, 622.0))}
    for name, (n, secs, seed, pitches) in splits.items():
        make_split(os.path.join(work, "songs", name), n, sr, secs, seed,
                   pitches)
        prep.to_spec(os.path.join(work, "songs", name),
                     os.path.join(work, "spec", name),
                     win_size=cfg.window_size, hop_size=cfg.hop_size, sr=sr)


def parse_log(path):
    """(train_losses, val_losses) from the reference-contract text log."""
    train_losses, val_losses = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("Val"):
                val_losses.append(float(line.split()[1]))
            elif line.strip():
                train_losses.append(float(line.strip()))
    return train_losses, val_losses


def eval_test_sdr(state, work, cfg, write_wavs=False):
    """Whole-song separation + BSS-eval over the demo's test split.
    Returns one metrics dict per song (SDR/SIR/SAR/NSDR, rounded)."""
    sr = cfg.sample_rate
    out = []
    test_dir = os.path.join(work, "songs", "test")
    for song in sorted(os.listdir(test_dir)):
        mix, _ = wavio.load_audio(os.path.join(test_dir, song, "mixture.wav"),
                                  sr=sr)
        ref, _ = wavio.load_audio(os.path.join(test_dir, song, "vocals.wav"),
                                  sr=sr)
        est = separate.separate_wav(state.params, state.bn_state, mix,
                                    cfg=cfg)
        m = bss.compute_metrics_for_track(mix, ref, est)
        out.append({"song": song, "sdr": round(m["SDR"], 2),
                    "sir": round(m["SIR"], 2), "sar": round(m["SAR"], 2),
                    "nsdr": round(m["NSDR"], 2)})
        if write_wavs:
            wavio.write_wav(os.path.join(work, f"{song}_vocal_est.wav"),
                            est, sr)
    return out


def main():
    import dataclasses

    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/convergence_demo"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    from svs_tpu.utils.config import get_config
    cfg = get_config("default")  # the SHIPPED config (bf16 since round 3)
    augment = False
    epoch_scan = False
    for tok in sys.argv[3:]:
        if tok in ("float32", "bfloat16"):
            cfg = dataclasses.replace(cfg, compute_dtype=tok)
        elif tok == "remat":
            cfg = dataclasses.replace(cfg, remat=True)
        elif tok == "augment":
            augment = True
        elif tok == "scan":
            epoch_scan = True
        elif tok:
            raise SystemExit(f"unknown token {tok!r} "
                             "(expected a dtype, 'remat', 'augment' or "
                             "'scan')")
    os.makedirs(work, exist_ok=True)

    prep_splits(work, cfg)
    print("prep done", flush=True)

    # fit() appends to the label's log; a reused workdir would prepend a
    # previous run's losses to the trajectory parsed below
    stale_log = os.path.join(work, "LOG", "log_demo.txt")
    if os.path.exists(stale_log):
        os.remove(stale_log)

    t0 = time.perf_counter()
    state = fit(TrainOptions(
        train_folder=os.path.join(work, "spec", "train"),
        valid_folder=os.path.join(work, "spec", "valid"),
        label="demo", epoch=epochs, batch_size=32, val_interval=20,
        ckpt_dir=os.path.join(work, "CKPT"), log_dir=os.path.join(work, "LOG"),
        load_path=os.path.join(work, "none"), progress=False,
        async_save=True, save_every=10, export_pth=True, seed=0,
        augment=augment, epoch_scan=epoch_scan,
    ), cfg)
    train_wall = time.perf_counter() - t0
    steps = int(state.step)
    print(f"train done: {steps} steps in {train_wall:.1f}s "
          f"({steps / train_wall:.1f} steps/s incl. host pipeline)", flush=True)

    # loss trajectory from the reference-contract text log
    train_losses, val_losses = parse_log(os.path.join(work, "LOG",
                                                      "log_demo.txt"))

    results = {"epochs": epochs, "steps": steps,
               "compute_dtype": cfg.compute_dtype, "remat": cfg.remat,
               "augment": augment, "epoch_scan": epoch_scan,
               "train_wall_s": round(train_wall, 1),
               "steps_per_sec_incl_host": round(steps / train_wall, 1),
               "loss_first": train_losses[0], "loss_last": train_losses[-1],
               "val_first": val_losses[0] if val_losses else None,
               "val_best": min(val_losses) if val_losses else None,
               "per_song": []}

    results["per_song"] = eval_test_sdr(state, work, cfg, write_wavs=True)
    for row in results["per_song"]:
        print(row["song"], row, flush=True)

    out = os.path.join(work, "summary.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
