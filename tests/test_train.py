"""Train step / checkpoint / loop tests (BASELINE.json config #4)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.train import checkpoint as ckpt_lib
from svs_tpu.train.loop import TrainOptions, fit
from svs_tpu.train.step import (create_train_state, get_learning_rate,
                                make_eval_step, make_optimizer,
                                make_train_step, set_learning_rate)
from svs_tpu.utils.config import SVSConfig


def _batch(rng, b=2, t=128):
    mix = rng.random((b, 512, t)).astype(np.float32)
    voc = (mix * rng.random((b, 512, t))).astype(np.float32)
    ang = ((rng.random((b, 512, t)) - 0.5) * 6).astype(np.float32)
    return {"mix": jnp.asarray(mix), "voc": jnp.asarray(voc),
            "mix_angle": jnp.asarray(ang), "voc_angle": jnp.asarray(ang)}


def test_train_step_reduces_loss(rng):
    cfg = SVSConfig()
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.key(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = _batch(rng)
    key = jax.random.key(1)
    losses = []
    for i in range(4):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["total"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(aux["grad_norm"]))
    assert losses[-1] < losses[0]  # overfitting a fixed batch
    assert int(state.step) == 4


def test_lr_drop_no_recompile(rng):
    cfg = SVSConfig()
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.key(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = _batch(rng)
    state, _ = step(state, batch, jax.random.key(1))
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)
    state2, aux = step(state, batch, jax.random.key(2))  # same compiled fn
    assert np.isfinite(float(aux["total"]))
    assert get_learning_rate(state2) == pytest.approx(5e-4)


def test_eval_step_deterministic(rng):
    cfg = SVSConfig()
    state = create_train_state(jax.random.key(0), cfg)
    ev = make_eval_step(cfg)
    batch = _batch(rng)
    a = float(ev(state, batch)["total"])
    b = float(ev(state, batch)["total"])
    assert a == b and np.isfinite(a)


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = SVSConfig()
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.key(0), cfg, opt)
    step = make_train_step(cfg, opt)
    state, _ = step(state, _batch(rng), jax.random.key(1))

    path = str(tmp_path / "a.ckpt")
    ckpt_lib.save(path, state, epoch=7, extras={"best_val_loss": 1.25})
    template = create_train_state(jax.random.key(9), cfg, opt)
    loaded, epoch, extras = ckpt_lib.load(path, template)
    assert epoch == 7 and extras["best_val_loss"] == pytest.approx(1.25)
    assert int(loaded.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(loaded.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state must keep optimising identically
    ev = make_eval_step(cfg)
    b0 = _batch(np.random.default_rng(5))
    np.testing.assert_allclose(float(ev(loaded, b0)["total"]),
                               float(ev(state, b0)["total"]), rtol=1e-6)


def test_pth_export_import_roundtrip(tmp_path):
    cfg = SVSConfig()
    state = create_train_state(jax.random.key(0), cfg)
    path = str(tmp_path / "a.pth")
    ckpt_lib.export_pth(path, state, epoch=3)
    template = create_train_state(jax.random.key(9), cfg)
    loaded, epoch, _ = ckpt_lib.resume(path, template)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(loaded.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def _make_spec_dataset(root, n_songs=2, t=150, seed=0):
    rng = np.random.default_rng(seed)
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


def test_fit_end_to_end(tmp_path):
    """Two epochs on a synthetic dataset: log-file contract, checkpoints,
    validation + best tracking (reference train.py:239-389 behaviour)."""
    train_dir = str(tmp_path / "train")
    valid_dir = str(tmp_path / "valid")
    _make_spec_dataset(train_dir, seed=0)
    _make_spec_dataset(valid_dir, seed=1)
    cfg = SVSConfig(samples_per_song=1)
    opts = TrainOptions(
        train_folder=train_dir, valid_folder=valid_dir, label="t",
        epoch=2, batch_size=2, val_interval=1,
        ckpt_dir=str(tmp_path / "CKPT"), log_dir=str(tmp_path / "LOG"),
        load_path=str(tmp_path / "none.ckpt"), progress=False,
    )
    state = fit(opts, cfg)
    assert int(state.step) == 2  # 2 songs x 1 sample / batch 2 = 1 step/epoch

    log = open(os.path.join(opts.log_dir, "log_t.txt")).read().splitlines()
    # contract: float line per epoch + "Val <float>" per validation
    assert len(log) == 4
    float(log[0]); float(log[2])
    assert log[1].startswith("Val ") and log[3].startswith("Val ")

    assert os.path.exists(os.path.join(opts.ckpt_dir, "svs_t.ckpt"))
    assert os.path.exists(os.path.join(opts.ckpt_dir, "svs_best_t.ckpt"))
    metrics = [json.loads(l) for l in
               open(os.path.join(opts.log_dir, "metrics_t.jsonl"))]
    # one train record per epoch + one val record per validation pass
    assert sum(1 for m in metrics if "train_loss" in m) == 2
    assert sum(1 for m in metrics if "val_loss" in m) == 2

    # resume continues from the saved epoch without retraining epoch 1
    opts2 = TrainOptions(**{**opts.__dict__,
                            "load_path": os.path.join(opts.ckpt_dir,
                                                      "svs_t.ckpt"),
                            "epoch": 3})
    state2 = fit(opts2, cfg)
    assert int(state2.step) == 3  # one more epoch only
@pytest.mark.slow


def test_fit_val_sdr(tmp_path):
    """--val_sdr: every validation pass also scores vocal SDR/NSDR over the
    validation songs (reference evaluate.py:203-239 metric, tracked during
    training); values land in the metrics JSONL, best-ckpt stays loss-based."""
    train_dir = str(tmp_path / "train")
    valid_dir = str(tmp_path / "valid")
    _make_spec_dataset(train_dir, seed=0)
    _make_spec_dataset(valid_dir, n_songs=2, seed=1)
    cfg = SVSConfig(samples_per_song=1)
    opts = TrainOptions(
        train_folder=train_dir, valid_folder=valid_dir, label="sdr",
        epoch=1, batch_size=2, val_interval=1,
        ckpt_dir=str(tmp_path / "CKPT"), log_dir=str(tmp_path / "LOG"),
        load_path=str(tmp_path / "none.ckpt"), progress=False,
        val_sdr=True, val_sdr_songs=1,
    )
    fit(opts, cfg)
    metrics = [json.loads(l) for l in
               open(os.path.join(opts.log_dir, "metrics_sdr.jsonl"))]
    val = [m for m in metrics if "val_loss" in m]
    assert len(val) == 1
    assert val[0]["sdr_songs"] == 1  # the --val_sdr_songs cap held
    for k in ("vocal_sdr", "vocal_sir", "vocal_sar", "vocal_nsdr"):
        assert np.isfinite(val[0][k])
@pytest.mark.slow


def test_validation_sdr_skips_silent_vocal(tmp_path):
    """Per-song resilience: an all-silent vocal (BSS eval undefined, like
    mir_eval) is skipped and reported, not fatal."""
    from svs_tpu.evaluation.val_sdr import validation_sdr
    from svs_tpu.train.step import create_train_state

    root = str(tmp_path / "valid")
    _make_spec_dataset(root, n_songs=2, seed=3)
    # silence song 0's vocal
    silent = os.path.join(root, "vocal", "0000_s0_spec.npy")
    np.save(silent, np.zeros_like(np.load(silent)))
    cfg = SVSConfig()
    state = create_train_state(jax.random.key(0), cfg)
    out = validation_sdr(jax.device_get(state.params),
                         jax.device_get(state.bn_state), root, cfg)
    assert len(out["per_song"]) == 1 and out["per_song"][0]["song"] == "0001_s1"
    assert len(out["skipped"]) == 1 and out["skipped"][0].startswith("0000_s0")
    assert np.isfinite(out["SDR"])
@pytest.mark.slow


def test_fit_with_mesh_dp(tmp_path):
    """The --dp path: fit() over an 8-device mesh (sharded batches, DP step,
    eval under sharding) must train and checkpoint like single-device."""
    from svs_tpu.parallel import mesh as mesh_lib

    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir, n_songs=2)
    cfg = SVSConfig(samples_per_song=8)
    opts = TrainOptions(
        train_folder=train_dir, valid_folder=train_dir, label="dp",
        epoch=1, batch_size=8, val_interval=1,
        ckpt_dir=str(tmp_path / "CKPT"), log_dir=str(tmp_path / "LOG"),
        load_path=str(tmp_path / "none.ckpt"), progress=False,
        mesh=mesh_lib.make_mesh(),
    )
    state = fit(opts, cfg)
    assert int(state.step) == 2  # 16 items / batch 8
    assert os.path.exists(os.path.join(opts.ckpt_dir, "svs_dp.ckpt"))
    log = open(os.path.join(opts.log_dir, "log_dp.txt")).read().splitlines()
    assert len(log) == 2 and log[1].startswith("Val ")


def test_export_pth_loads_strict_in_torch(tmp_path):
    """Exported .pth must satisfy torch's strict load on a reference-shaped
    module (incl. num_batches_tracked keys)."""
    import torch
    import torch.nn as nn
    from svs_tpu.train import checkpoint as ckpt_lib
    from tests.test_unet import build_torch_oracle

    state = create_train_state(jax.random.key(0), SVSConfig())
    path = str(tmp_path / "x.pth")
    ckpt_lib.export_pth(path, state, epoch=1)

    m = build_torch_oracle(randomize_stats=False)
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    # strict load raises on any missing/unexpected key
    m.load_state_dict(ckpt["model_state_dict"], strict=True)
@pytest.mark.slow


def test_fit_async_save_equivalent(tmp_path):
    """async_save=True produces a checkpoint (and exported .pth — the export
    also runs on the saver worker, no main-thread D2H) identical in content
    to the synchronous path and resumable."""
    import torch

    train_dir = str(tmp_path / "train")
    _make_spec_dataset(train_dir)
    cfg = SVSConfig(samples_per_song=1)
    common = dict(train_folder=train_dir, valid_folder="nope",
                  epoch=2, batch_size=2, export_pth=True,
                  log_dir=str(tmp_path / "LOG"),
                  load_path=str(tmp_path / "none.ckpt"), progress=False)
    fit(TrainOptions(label="sync", ckpt_dir=str(tmp_path / "C1"), **common),
        cfg)
    fit(TrainOptions(label="asyn", ckpt_dir=str(tmp_path / "C2"),
                     async_save=True, **common), cfg)

    tpl = create_train_state(jax.random.key(0), cfg)
    s1, e1, x1 = ckpt_lib.load(os.path.join(str(tmp_path / "C1"),
                                            "svs_sync.ckpt"), tpl)
    s2, e2, x2 = ckpt_lib.load(os.path.join(str(tmp_path / "C2"),
                                            "svs_asyn.ckpt"), tpl)
    assert e1 == e2 == 2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(x1["loss_list_total"], x2["loss_list_total"])

    p1 = torch.load(os.path.join(str(tmp_path / "C1"), "svs_sync.pth"),
                    map_location="cpu", weights_only=True)
    p2 = torch.load(os.path.join(str(tmp_path / "C2"), "svs_asyn.pth"),
                    map_location="cpu", weights_only=True)
    assert p1["epoch"] == p2["epoch"] == 2
    assert p1["model_state_dict"].keys() == p2["model_state_dict"].keys()
    for k, v in p1["model_state_dict"].items():
        np.testing.assert_array_equal(v.numpy(),
                                      p2["model_state_dict"][k].numpy())
