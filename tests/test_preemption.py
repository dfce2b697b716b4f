"""Graceful-preemption test: SIGTERM mid-training saves a resumable
checkpoint (SURVEY.md §5 failure recovery)."""

import os
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest


def _make_spec_dataset(root, n_songs=2, t=150):
    rng = np.random.default_rng(0)
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(root, folder), exist_ok=True)
    for i in range(n_songs):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(os.path.join(root, folder, f"{base}_spec.npy"),
                    rng.random((513, t)).astype(np.float32))
            ang = rng.random((513, t)).astype(np.float32) * 6 - 3
            np.save(os.path.join(root, folder, f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))
@pytest.mark.slow


def test_sigterm_saves_resumable_checkpoint(tmp_path):
    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir)
    ckpt_dir = str(tmp_path / "CKPT")
    script = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from svs_tpu.train.loop import TrainOptions, fit
        from svs_tpu.utils.config import SVSConfig
        print("READY", flush=True)
        fit(TrainOptions(
            train_folder={train_dir!r}, valid_folder="nope",
            label="pre", epoch=10000, batch_size=2,
            ckpt_dir={ckpt_dir!r}, log_dir={str(tmp_path / 'LOG')!r},
            load_path="none", progress=False,
        ), SVSConfig(samples_per_song=64))
    """)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, env=env, text=True)
    try:
        # wait for training to actually run a few steps
        deadline = time.time() + 240
        while time.time() < deadline:
            if os.path.exists(os.path.join(str(tmp_path / "LOG"),
                                           "metrics_pre.jsonl")):
                break
            if proc.poll() is not None:
                raise AssertionError(proc.stdout.read())
            time.sleep(1.0)
        else:
            raise AssertionError("training never produced metrics")
        time.sleep(2.0)
        proc.send_signal(signal.SIGTERM)
        # generous: the loop finishes its in-flight step and serialises the
        # full checkpoint before exiting, which under a loaded machine (the
        # full suite plus background jobs) has been seen to exceed 120 s
        proc.wait(timeout=420)
    finally:
        if proc.poll() is None:
            proc.kill()

    out = proc.stdout.read()
    assert proc.returncode == 143, f"exit={proc.returncode}\n{out}"
    path = os.path.join(ckpt_dir, "svs_pre.ckpt")
    assert os.path.exists(path)

    import jax
    from svs_tpu.train import checkpoint as ckpt_lib
    from svs_tpu.train.step import create_train_state
    from svs_tpu.utils.config import SVSConfig
    template = create_train_state(jax.random.key(0), SVSConfig())
    state, epoch, extras = ckpt_lib.load(path, template)
    assert "loss_list_total" in extras  # resumable with history
