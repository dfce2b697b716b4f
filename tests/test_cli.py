"""Full-pipeline CLI test: the reference's manual file-mediated workflow
(readme.md:20-35) driven end-to-end through the preserved flag surface:

wav songs -> data to_spec -> train -> inference -> data to_wave -> evaluate
plus the viz and lossplot diagnostics.
"""

import os
import re

import numpy as np
import pytest

from svs_tpu.cli import (data_cli, eval_cli, infer_cli, lossplot_cli,
                         train_cli, viz_cli)
from svs_tpu.data import wav as wavio

SR = 8192


def _make_songs(root, n=2, secs=4.0):
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * secs)) / SR
    for i in range(n):
        d = os.path.join(root, f"song{i}")
        os.makedirs(d)
        voc = 0.3 * np.sin(2 * np.pi * (500 + 80 * i) * t).astype(np.float32)
        acc = (0.2 * np.sin(2 * np.pi * 150 * t)
               + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        wavio.write_wav(os.path.join(d, "vocals.wav"), voc, SR)
        wavio.write_wav(os.path.join(d, "mixture.wav"), voc + acc, SR)


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    src = str(root / "songs")
    os.makedirs(src)
    _make_songs(src)
    spec = str(root / "spec")
    assert data_cli.main(["--src", src, "--tar", spec,
                          "--direction", "to_spec"]) == 0
    return root, src, spec


def test_full_pipeline(pipeline_dir):
    root, src, spec = pipeline_dir

    # --- train one epoch (reference train.py flag surface) ---
    ckpt_dir, log_dir = str(root / "CKPT"), str(root / "LOG")
    rc = train_cli.main([
        "--train_folder", spec, "--valid_folder", spec,
        "--label", "cli", "--epoch", "1", "--batch_size", "2",
        "--val_interval", "1", "--ckpt_dir", ckpt_dir, "--log_dir", log_dir,
        "--load_path", str(root / "none.ckpt"),
        "--samples_per_song", "2",
    ])
    assert rc == 0
    model = os.path.join(ckpt_dir, "svs_cli.ckpt")
    assert os.path.exists(model)
    assert os.path.exists(os.path.join(ckpt_dir, "svs_best_cli.ckpt"))

    # --- inference over mixture specs ---
    pred = str(root / "pred")
    rc = infer_cli.main(["--model_path", model, "--tar", pred,
                         "--mixture_folder", os.path.join(spec, "mixture"),
                         "--vocal_solo", "1"])
    assert rc == 0
    outs = sorted(os.listdir(pred))
    assert outs == ["0000_song0_spec.npy", "0001_song1_spec.npy"]
    m = np.load(os.path.join(pred, outs[0]))
    ref_mag = np.load(os.path.join(spec, "mixture", outs[0]))
    assert m.shape == ref_mag.shape
    assert (m <= ref_mag + 1e-5).all()  # mask in [0,1]

    # --- reconstruct wavs with mixture phase ---
    wav_out = str(root / "wav_out")
    rc = data_cli.main(["--src", pred, "--tar", wav_out, "--phase", spec,
                        "--direction", "to_wave"])
    assert rc == 0
    assert sorted(os.listdir(wav_out)) == ["0000_song0.wav", "0001_song1.wav"]

    # --- ground-truth wavs for evaluation (readme workflow) ---
    gt_voc = str(root / "gt_vocal")
    gt_mix = str(root / "gt_mix")
    assert data_cli.main(["--src", os.path.join(spec, "vocal"),
                          "--tar", gt_voc, "--phase", spec,
                          "--direction", "to_wave"]) == 0
    assert data_cli.main(["--src", os.path.join(spec, "mixture"),
                          "--tar", gt_mix, "--phase", spec,
                          "--direction", "to_wave"]) == 0

    # --- evaluate (reference evaluate.py flag surface) ---
    csv_path = str(root / "results.csv")
    rc = eval_cli.main(["--est", wav_out, "--mix", gt_mix, "--ref", gt_voc,
                        "--out_csv", csv_path])
    assert rc == 0
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0] == "track,SDR,SIR,SAR,NSDR"
    assert len(rows) == 3  # header + 2 tracks

    # --- viz diagnostic figure ---
    out_png = str(root / "viz.png")
    rc = viz_cli.main(["--model_path", model,
                       "--spec_path", os.path.join(spec, "mixture",
                                                   "0000_song0_spec.npy"),
                       "--out", out_png])
    assert rc == 0 and os.path.getsize(out_png) > 10000

    # --- loss plot from the LOG contract ---
    out_loss = str(root / "loss.png")
    rc = lossplot_cli.main([os.path.join(log_dir, "log_cli.txt"),
                            "--out", out_loss])
    assert rc == 0 and os.path.exists(out_loss)


def test_data_cli_to_wave_requires_phase(tmp_path):
    with pytest.raises(SystemExit):
        data_cli.main(["--src", str(tmp_path), "--tar", str(tmp_path / "o"),
                       "--direction", "to_wave"])


def test_data_cli_empty_src_fails(tmp_path):
    src = tmp_path / "empty"
    os.makedirs(src)
    rc = data_cli.main(["--src", str(src), "--tar", str(tmp_path / "o"),
                        "--direction", "to_spec"])
    assert rc == 1


def test_infer_cli_limit(pipeline_dir, tmp_path):
    """--limit reproduces the reference's 20-file debug cap
    (inference.py:59) at any N."""
    root, src, spec = pipeline_dir
    model = os.path.join(str(root / "CKPT"), "svs_cli.ckpt")
    pred = str(tmp_path / "pred1")
    rc = infer_cli.main(["--model_path", model, "--tar", pred,
                         "--mixture_folder", os.path.join(spec, "mixture"),
                         "--limit", "1"])
    assert rc == 0
    assert len(os.listdir(pred)) == 1


def test_infer_cli_bad_model(tmp_path):
    rc = infer_cli.main(["--model_path", str(tmp_path / "missing.ckpt"),
                         "--tar", str(tmp_path / "o"),
                         "--mixture_folder", str(tmp_path)])
    assert rc == 1


def test_eval_cli_parallel_jobs(pipeline_dir, tmp_path):
    """--jobs N gives identical results to serial evaluation."""
    root, src, spec = pipeline_dir
    wav_out = str(root / "wav_out")
    gt_voc, gt_mix = str(root / "gt_vocal"), str(root / "gt_mix")
    c1, c2 = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    assert eval_cli.main(["--est", wav_out, "--mix", gt_mix, "--ref", gt_voc,
                          "--out_csv", c1]) == 0
    assert eval_cli.main(["--est", wav_out, "--mix", gt_mix, "--ref", gt_voc,
                          "--out_csv", c2, "--jobs", "2"]) == 0
    assert open(c1).read() == open(c2).read()


def test_eval_cli_jax_impl(pipeline_dir, tmp_path):
    """--impl jax agrees with the numpy backend (f64 on the CPU platform)."""
    import csv

    root, src, spec = pipeline_dir
    wav_out = str(root / "wav_out")
    gt_voc, gt_mix = str(root / "gt_vocal"), str(root / "gt_mix")
    c1, c2 = str(tmp_path / "np.csv"), str(tmp_path / "jx.csv")
    assert eval_cli.main(["--est", wav_out, "--mix", gt_mix, "--ref", gt_voc,
                          "--out_csv", c1]) == 0
    assert eval_cli.main(["--est", wav_out, "--mix", gt_mix, "--ref", gt_voc,
                          "--out_csv", c2, "--impl", "jax"]) == 0
    rows1 = list(csv.DictReader(open(c1)))
    rows2 = list(csv.DictReader(open(c2)))
    assert [r["track"] for r in rows1] == [r["track"] for r in rows2]
    for r1, r2 in zip(rows1, rows2):
        for k in ("SDR", "SIR", "SAR", "NSDR"):
            assert abs(float(r1[k]) - float(r2[k])) < 1e-8


@pytest.mark.slow
def test_parity_musdb_playbook_synthetic(tmp_path):
    """VERDICT r4 next #3: the one-command MUSDB parity playbook, proven in
    CI via --synthetic — generated corpus, prep -> train -> inference ->
    to_wave -> evaluate -> baseline table, all through the real console
    shims in a subprocess.  A green run certifies the exact command chain
    that will produce the real-data number the moment MUSDB18/weights
    appear."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # the CLI subprocesses run on the CPU backend, where
    # enable_compile_cache() stays off by design — point the env at the
    # suite's persistent cache so CI reruns skip the big compiles
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(repo, ".cache", "jax")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "parity_musdb.py"),
         "--synthetic", "--epochs", "3",
         "--workdir", str(tmp_path / "pw"),
         "--train_args", "--samples_per_song 8 --batch_size 8"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"playbook failed rc={proc.returncode}\nstdout tail:\n"
        f"{proc.stdout[-3000:]}\nstderr tail:\n{proc.stderr[-3000:]}")
    assert "=== Parity vs reference svs_400" in proc.stdout
    # the table must carry real numbers for all four metrics
    for k in ("SDR", "SIR", "SAR", "NSDR"):
        assert re.search(rf"^{k}\s+[-+\d.]+\s", proc.stdout, re.M), (
            k, proc.stdout[-2000:])
    assert (tmp_path / "pw" / "parity.csv").exists()
    assert "[synthetic mode]" in proc.stdout
