"""Gradient accumulation (optax.MultiSteps in make_optimizer): params
update once every K microbatches with their mean gradient; LR mutation and
checkpointing work through the wrapper."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from svs_tpu.losses.mrstft import combined_loss
from svs_tpu.models import unet
from svs_tpu.train.step import (create_train_state, get_learning_rate,
                                make_optimizer, make_train_step,
                                set_learning_rate)
from svs_tpu.utils.config import SVSConfig


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _batch(rng, b=4, t=64):
    mix = rng.random((b, 512, t)).astype(np.float32)
    voc = (mix * 0.5).astype(np.float32)
    ang = ((rng.random((b, 512, t)) - 0.5) * 6).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in
            {"mix": mix, "voc": voc, "mix_angle": ang,
             "voc_angle": ang}.items()}


def test_k1_is_the_bare_optimizer():
    cfg = SVSConfig(input_len=64)
    st = create_train_state(jax.random.key(0), cfg, make_optimizer(cfg, 1))
    assert hasattr(st.opt_state, "hyperparams")  # no MultiSteps wrapper


def test_params_update_only_every_k(rng):
    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    opt = make_optimizer(cfg, accum_steps=3)
    step = make_train_step(cfg, opt)
    st = create_train_state(jax.random.key(0), cfg, opt)
    p0 = jax.tree.map(np.asarray, st.params)

    st, _ = step(st, _batch(rng), jax.random.key(1))
    st, _ = step(st, _batch(rng), jax.random.key(2))
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), b)  # frozen mid-cycle

    st, _ = step(st, _batch(rng), jax.random.key(3))
    deltas = [float(np.max(np.abs(np.asarray(a) - b)))
              for a, b in zip(jax.tree.leaves(st.params),
                              jax.tree.leaves(p0))]
    assert max(deltas) > 0  # the k-th microbatch applies the update


def test_applied_update_is_mean_gradient(rng):
    """With an SGD(lr=1) inner optimizer the applied update IS the mean of
    the per-microbatch gradients — replay them with jax.grad (gradients
    taken at the UNCHANGED params but the evolving BN state, exactly what
    the accumulating step sees)."""
    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    inner = optax.inject_hyperparams(optax.sgd)(learning_rate=1.0)
    opt = optax.MultiSteps(inner, every_k_schedule=2)
    step = make_train_step(cfg, opt)
    st = create_train_state(jax.random.key(0), cfg, opt)
    p0 = st.params
    bn0 = st.bn_state
    # the jitted step donates the state, deleting p0's buffers — keep a
    # host copy for the replay comparison
    p0_np = jax.tree.map(np.asarray, p0)
    b1, b2 = _batch(rng), _batch(rng)

    def loss_fn(params, bn_state, batch, key):
        mask, new_bn = unet.apply(params, bn_state, batch["mix"], train=True,
                                  dropout_rng=key, cfg=cfg)
        total, _ = combined_loss(mask, batch["mix"], batch["voc"],
                                 batch["mix_angle"], batch["voc_angle"], cfg)
        return total, new_bn

    grad = jax.jit(jax.grad(loss_fn, has_aux=True))
    g1, bn1 = grad(p0, bn0, b1, jax.random.key(1))
    g2, _ = grad(p0, bn1, b2, jax.random.key(2))
    g1_np = jax.tree.map(np.asarray, g1)
    g2_np = jax.tree.map(np.asarray, g2)

    st, _ = step(st, b1, jax.random.key(1))
    st, _ = step(st, b2, jax.random.key(2))

    want = jax.tree.map(lambda p, a, b: p - 0.5 * (a + b),
                        p0_np, g1_np, g2_np)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_lr_mutation_through_the_wrapper():
    cfg = SVSConfig(input_len=64)
    opt = make_optimizer(cfg, accum_steps=4)
    st = create_train_state(jax.random.key(0), cfg, opt)
    assert get_learning_rate(st) == pytest.approx(cfg.learning_rate)
    st = set_learning_rate(st, 5e-4)
    assert get_learning_rate(st) == pytest.approx(5e-4)
@pytest.mark.slow


def test_fit_accum_end_to_end(tmp_path, rng):
    """fit(accum_steps=2) trains, checkpoints and RESUMES with the wrapped
    opt state (the MultiSteps counters/buffers round-trip msgpack)."""
    from svs_tpu.train.loop import TrainOptions, fit

    train_dir = str(tmp_path / "spec")
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(train_dir, folder), exist_ok=True)
    for i in range(2):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(os.path.join(train_dir, folder, f"{base}_spec.npy"),
                    rng.random((513, 80)).astype(np.float32))
            ang = rng.random((513, 80)).astype(np.float32) * 6 - 3
            np.save(os.path.join(train_dir, folder, f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))

    cfg = SVSConfig(input_len=64, samples_per_song=2, dropout_rate=0.0)
    common = dict(
        train_folder=train_dir, valid_folder="missing", label="ac",
        batch_size=2, ckpt_dir=str(tmp_path / "CKPT"),
        log_dir=str(tmp_path / "LOG"), progress=False, accum_steps=2,
    )
    state = fit(TrainOptions(epoch=1, load_path="none", **common), cfg)
    assert int(state.step) == 2  # 2 microbatch steps (one applied update)
    assert int(state.opt_state.gradient_step) == 1
    ckpt = str(tmp_path / "CKPT" / "svs_ac.ckpt")
    assert os.path.exists(ckpt)

    state2 = fit(TrainOptions(epoch=2, load_path=ckpt, **common), cfg)
    assert int(state2.step) == 4
    assert int(state2.opt_state.gradient_step) == 2

    # params/BN-only consumers (inference/serve/viz) must load an accum
    # checkpoint with a default-optimizer template: restore_opt=False skips
    # the MultiSteps-wrapped opt state entirely
    from svs_tpu.train import checkpoint as ckpt_lib

    plain = create_train_state(jax.random.key(0), cfg)
    loaded, ep, _ = ckpt_lib.resume(ckpt, plain, restore_opt=False)
    assert ep == 2  # the epoch-2 run rewrote the latest checkpoint
    assert jax.tree.structure(loaded.params) \
        == jax.tree.structure(plain.params)
    # ...while a mismatched TRAIN resume fails with the actionable message
    with pytest.raises(ValueError, match="accum"):
        ckpt_lib.resume(ckpt, plain)
@pytest.mark.slow


def test_fit_accum_composes_with_epoch_scan(tmp_path, rng):
    """accum + epoch_scan: the MultiSteps-wrapped optimizer rides inside
    the scanned epoch program (the scan body IS make_step_fn, which the
    wrapper is part of) — trajectory must match the per-step accum run."""
    from svs_tpu.train.loop import TrainOptions, fit

    train_dir = str(tmp_path / "spec")
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(train_dir, folder), exist_ok=True)
    for i in range(2):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(os.path.join(train_dir, folder, f"{base}_spec.npy"),
                    rng.random((513, 80)).astype(np.float32))
            ang = rng.random((513, 80)).astype(np.float32) * 6 - 3
            np.save(os.path.join(train_dir, folder, f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))

    cfg = SVSConfig(input_len=64, samples_per_song=2, dropout_rate=0.0)

    def run(scan, tag):
        return fit(TrainOptions(
            train_folder=train_dir, valid_folder="missing", label=tag,
            epoch=2, batch_size=2, ckpt_dir=str(tmp_path / f"CKPT_{tag}"),
            log_dir=str(tmp_path / f"LOG_{tag}"), progress=False,
            accum_steps=2, device_data="on", epoch_scan=scan,
            load_path="none",
        ), cfg)

    s_step = run(False, "as")
    s_scan = run(True, "asc")
    # 2 songs x 2 samples / batch 2 = 2 microbatch steps/epoch x 2 epochs
    assert int(s_scan.step) == int(s_step.step) == 4
    assert int(s_scan.opt_state.gradient_step) \
        == int(s_step.opt_state.gradient_step) == 2
    # same index stream + rng sequence; scan-fusion float noise through
    # Adam's near-zero-gradient envelope (~2.1*lr per applied update on a
    # sign flip — the bound test_epoch_scan.py documents), 2 updates here
    leaves = [(np.asarray(a), np.asarray(b))
              for a, b in zip(jax.tree.leaves(s_step.params),
                              jax.tree.leaves(s_scan.params))]
    lr = cfg.learning_rate
    max_d = max(float(np.max(np.abs(a - b))) for a, b in leaves)
    mean_d = (sum(float(np.sum(np.abs(a - b))) for a, b in leaves)
              / sum(a.size for a, _ in leaves))
    assert max_d <= 2 * 2.1 * lr, max_d
    assert mean_d < 2e-4, mean_d


def test_preemption_save_drops_partial_cycle(rng):
    """reset_accumulation zeroes mini_step/acc_grads (and is a no-op on
    unwrapped states) — the mid-epoch preemption save contract."""
    from svs_tpu.train.step import reset_accumulation

    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    opt = make_optimizer(cfg, accum_steps=3)
    step = make_train_step(cfg, opt)
    st = create_train_state(jax.random.key(0), cfg, opt)
    st, _ = step(st, _batch(rng), jax.random.key(1))
    assert int(st.opt_state.mini_step) == 1
    assert any(float(np.max(np.abs(np.asarray(g)))) > 0
               for g in jax.tree.leaves(st.opt_state.acc_grads))

    st = reset_accumulation(st)
    assert int(st.opt_state.mini_step) == 0
    assert all(float(np.max(np.abs(np.asarray(g)))) == 0
               for g in jax.tree.leaves(st.opt_state.acc_grads))

    bare = create_train_state(jax.random.key(0), cfg)
    assert reset_accumulation(bare) is bare
