"""One-command MUSDB18 SDR-parity playbook (VERDICT r4 next #3).

The reference's headline result is measured MUSDB18 vocal SDR (4.515 dB for
ckpt ``svs_400``, reference evaluate.py:203-207).  Neither MUSDB18 nor the
author's pretrained weights exist in this zero-egress image, so real-data
parity is environment-blocked — this script makes it LITERALLY one command
the moment either appears:

    scripts/parity_musdb.sh --musdb /path/to/musdb18hq [--pth svs_unet.pth]

Pipeline (reference readme.md:20-35, run end-to-end):
  1. prep      — wav -> spectrograms for the test split (and train split
                 when training from scratch)             [data.py to_spec]
  2. weights   — import the reference ``.pth`` (``--pth``) / reuse a native
                 checkpoint (``--ckpt``) / train from scratch [train.py]
  3. inference — masked magnitudes for every test mixture [inference.py]
  4. to_wave   — mixture-phase iSTFT reconstruction       [data.py to_wave]
  5. evaluate  — BSS-eval vocal SDR/SIR/SAR/NSDR, printed against the
                 BASELINE.md table                        [evaluate.py]

``--synthetic`` replaces step 0 with a generated MUSDB-shaped corpus
(song folders holding mixture.wav + vocals.wav) and trains a few epochs —
the full chain incl. the final table runs in CI (tests/test_cli.py), so the
playbook itself is proven even though the data is not real.

Each stage shells the SAME console entry points a user would run (the root
shims accept reference syntax verbatim), so a green synthetic run certifies
the exact command chain, not a lookalike.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference evaluate.py:203-207 — the parity bar (ckpt svs_400)
BASELINE_SVS400 = {"SDR": 4.515, "SIR": 15.323, "SAR": 5.605, "NSDR": 8.078}


def _run(cmd, **kw):
    print(f"\n$ {' '.join(cmd)}", flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(cmd, check=True, cwd=kw.pop("cwd", REPO),
                          env=env, **kw)


def make_synthetic_musdb(root: str, n_train: int = 3, n_test: int = 2,
                         secs: float = 6.0, sr: int = 8192) -> None:
    """A MUSDB-shaped corpus: <root>/{train,test}/<song>/{mixture,vocals}.wav
    with harmonic 'vocals' + chordal 'accompaniment' so separation is
    learnable in a few epochs (same fixture family as utils/benchmark.py)."""
    import numpy as np

    from svs_tpu.data import wav as wavio

    rng = np.random.default_rng(0)
    n = int(sr * secs)
    t = np.arange(n) / sr
    for split, count in (("train", n_train), ("test", n_test)):
        for i in range(count):
            f_voc = 200.0 + 60.0 * i + 10.0 * rng.random()
            vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
            voc = (0.35 * np.sin(2 * np.pi * f_voc * vib * t)
                   + 0.15 * np.sin(2 * np.pi * 2 * f_voc * t)).astype(
                       np.float32)
            acc = (0.25 * np.sin(2 * np.pi * 110.0 * t)
                   + 0.2 * np.sin(2 * np.pi * 165.0 * t)
                   + 0.02 * rng.standard_normal(n)).astype(np.float32)
            d = os.path.join(root, split, f"song{i}")
            os.makedirs(d, exist_ok=True)
            wavio.write_wav(os.path.join(d, "vocals.wav"), voc, sr)
            wavio.write_wav(os.path.join(d, "mixture.wav"), voc + acc, sr)


def flatten_split(musdb_split: str, out_mix: str, out_ref: str,
                  sr: int) -> None:
    """MUSDB song dirs -> flat wav folders named like to_wave's outputs
    (``NNNN_<song>.wav`` — prep.py enumerates sorted song dirs the same
    way), mono-resampled to the model sample rate (evaluate.py requires
    est/mix/ref to share one rate; est comes out of to_wave at ``sr``)."""
    import numpy as np

    from svs_tpu.data import wav as wavio
    from svs_tpu.utils.config import num2str

    os.makedirs(out_mix, exist_ok=True)
    os.makedirs(out_ref, exist_ok=True)
    songs = sorted(d for d in os.listdir(musdb_split)
                   if os.path.isdir(os.path.join(musdb_split, d)))
    for idx, name in enumerate(songs):
        base = f"{num2str(idx)}_{name}.wav"
        for wav_name, out_dir in (("mixture.wav", out_mix),
                                  ("vocals.wav", out_ref)):
            y, _ = wavio.load_audio(
                os.path.join(musdb_split, name, wav_name), sr=sr, mono=True)
            wavio.write_wav(os.path.join(out_dir, base),
                            y.astype(np.float32), sr)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--musdb", type=str, default=None,
                   help="MUSDB18(-HQ) root with test/ (+ train/ if training "
                        "from scratch); song dirs hold mixture.wav + "
                        "vocals.wav")
    p.add_argument("--pth", type=str, default=None,
                   help="reference PyTorch checkpoint to import (skips "
                        "training; the parity configuration)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="native checkpoint to reuse (skips training)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a MUSDB-shaped synthetic corpus and run "
                        "the WHOLE chain on it (CI proof mode)")
    p.add_argument("--epochs", type=int, default=500,
                   help="training length when no weights are given "
                        "(reference svs_400 = 400 epochs + LR drop; "
                        "synthetic mode wants ~20)")
    p.add_argument("--workdir", type=str, default="parity_work")
    p.add_argument("--label", type=str, default="parity")
    p.add_argument("--preset", type=str, default="default")
    p.add_argument("--train_args", type=str, default="",
                   help="extra flags forwarded to train.py (e.g. "
                        "'--device_data on --epoch_scan --augment')")
    args = p.parse_args(argv)

    sys.path.insert(0, REPO)
    from svs_tpu.utils.config import get_config

    cfg = get_config(args.preset)
    work = os.path.abspath(args.workdir)
    os.makedirs(work, exist_ok=True)

    musdb = args.musdb
    if args.synthetic:
        musdb = os.path.join(work, "synthetic_musdb")
        if not os.path.isdir(musdb):
            print(f"== generating synthetic MUSDB-shaped corpus at {musdb}")
            make_synthetic_musdb(musdb, sr=cfg.sample_rate)
    if not musdb or not os.path.isdir(os.path.join(musdb, "test")):
        p.error("--musdb must point at a directory with a test/ split "
                "(or pass --synthetic)")

    py = sys.executable
    spec_test = os.path.join(work, "spec", "test")

    # 1. prep (reference readme.md:22-24 / v2s.sh)
    _run([py, "data.py", "--src", os.path.join(musdb, "test"),
          "--tar", spec_test, "--direction", "to_spec",
          "--sr", str(cfg.sample_rate), "--win_size", str(cfg.window_size),
          "--hop_size", str(cfg.hop_size)])

    # 2. weights
    model_path = args.pth or args.ckpt
    if not model_path:
        train_split = os.path.join(musdb, "train")
        if not os.path.isdir(train_split):
            p.error("no --pth/--ckpt and no train/ split to train from")
        spec_train = os.path.join(work, "spec", "train")
        _run([py, "data.py", "--src", train_split, "--tar", spec_train,
              "--direction", "to_spec", "--sr", str(cfg.sample_rate),
              "--win_size", str(cfg.window_size),
              "--hop_size", str(cfg.hop_size)])
        ckpt_dir = os.path.join(work, "CKPT")
        cmd = [py, "train.py", "--train_folder", spec_train,
               "--label", args.label, "--epoch", str(args.epochs),
               "--batch_size", "32", "--preset", args.preset,
               "--ckpt_dir", ckpt_dir,
               "--log_dir", os.path.join(work, "LOG")]
        if args.train_args:
            cmd += args.train_args.split()
        _run(cmd)
        model_path = os.path.join(ckpt_dir, f"svs_{args.label}.ckpt")

    # 3. inference (readme.md:27-29; --limit none lifts the reference's
    # silent 20-file debug cap, documented divergence)
    est_spec = os.path.join(work, "est_spec")
    _run([py, "inference.py", "--model_path", model_path,
          "--tar", est_spec,
          "--mixture_folder", os.path.join(spec_test, "mixture"),
          "--preset", args.preset])

    # 4. to_wave with the mixture phase (readme.md:31-34)
    est_wav = os.path.join(work, "est_wav")
    _run([py, "data.py", "--src", est_spec, "--phase", spec_test,
          "--tar", est_wav, "--direction", "to_wave",
          "--sr", str(cfg.sample_rate), "--win_size", str(cfg.window_size),
          "--hop_size", str(cfg.hop_size)])

    # 5. evaluate against flattened ground truth
    flat_mix = os.path.join(work, "gt_mix")
    flat_ref = os.path.join(work, "gt_vocal")
    print("\n== flattening ground truth (mono @ model sample rate)")
    flatten_split(os.path.join(musdb, "test"), flat_mix, flat_ref,
                  cfg.sample_rate)
    out = _run([py, "evaluate.py", "--est", est_wav, "--mix", flat_mix,
                "--ref", flat_ref,
                "--out_csv", os.path.join(work, "parity.csv")],
               capture_output=True, text=True)
    print(out.stdout)

    means = dict(re.findall(r"Mean (\w+)\s*:\s*(-?[\d.]+) dB", out.stdout))
    print("=== Parity vs reference svs_400 (BASELINE.md / "
          "reference evaluate.py:203-207) ===")
    print(f"{'metric':<6} {'this run':>10} {'svs_400':>10} {'delta':>8}")
    for k, ref in BASELINE_SVS400.items():
        if k in means:
            got = float(means[k])
            print(f"{k:<6} {got:>10.3f} {ref:>10.3f} {got - ref:>+8.3f}")
        else:
            print(f"{k:<6} {'n/a':>10} {ref:>10.3f}")
    if args.synthetic:
        print("\n[synthetic mode] deltas are NOT a parity claim — the "
              "corpus is generated; this run certifies the command chain. "
              "Re-run with real --musdb (and --pth for the reference "
              "weights) for the real number.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
