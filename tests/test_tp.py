"""Tensor (channel) parallelism equivalence tests (parallel/tp.py).

Same proof obligation as the DP suite (tests/test_parallel.py): the
channel-sharded program must be numerically equivalent to the single-device
step on the same batch — a wrong partitioning of a conv, a BN stat, or an
Adam moment shows up here as a real divergence, not a fuzzy tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from svs_tpu.models import unet
from svs_tpu.parallel import tp
from svs_tpu.train.step import create_train_state, make_train_step
from svs_tpu.utils.config import SVSConfig


def _batch(rng, b=8, t=64):
    mix = rng.random((b, 512, t)).astype(np.float32)
    voc = (mix * 0.5).astype(np.float32)
    ang = ((rng.random((b, 512, t)) - 0.5) * 6).astype(np.float32)
    return {"mix": mix, "voc": voc, "mix_angle": ang, "voc_angle": ang}


def test_channel_rule_shards_for_real():
    """The sharding rule must actually partition the big kernels — a rule
    that silently replicates everything would pass every parity test."""
    cfg = SVSConfig(input_len=64)
    mesh = tp.make_2d_mesh(1, 8)
    st = tp.shard_state(create_train_state(jax.random.key(0), cfg), mesh)

    w = st.params["enc"][3]["w"]  # (5, 5, 64, 128): O shards 8-way
    assert w.addressable_shards[0].data.shape == (5, 5, 64, 16)
    # dec6 (5, 5, 32, 1): O=1 not divisible -> falls back to I
    w6 = st.params["dec"][5]["w"]
    assert w6.addressable_shards[0].data.shape == (5, 5, 4, 1)
    # per-channel vectors shard with their layer
    assert st.params["enc"][5]["scale"].addressable_shards[0].data.shape == (64,)
    # dec6 bias (1,) and the step counter stay replicated
    assert st.params["dec"][5]["b"].addressable_shards[0].data.shape == (1,)
    assert st.step.addressable_shards[0].data.shape == ()
    # Adam moments co-shard with their params (uniform rule)
    opt = tp.tree_shardings(st.opt_state, mesh)
    flat = {str(s.spec) for s in jax.tree.leaves(opt)}
    assert "PartitionSpec(None, None, None, 'model')" in flat


def test_tp_step_matches_single_device(rng):
    """Channel-sharded train step == unsharded step on the same batch.

    SGD for the same conditioning reason as the DP test (Adam's step-1
    sign-descent amplifies reduction-order noise on near-zero grads)."""
    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.01)
    batch = _batch(rng)
    key = jax.random.key(1)

    s1, a1 = make_train_step(cfg, opt)(
        create_train_state(jax.random.key(0), cfg, opt),
        {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = tp.make_2d_mesh(1, 8)  # pure TP: all 8 devices on channels
    st = tp.shard_state(create_train_state(jax.random.key(0), cfg, opt), mesh)
    s2, a2 = tp.make_tp_train_step(mesh, cfg, opt)(
        st, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    np.testing.assert_allclose(float(a2["total"]), float(a1["total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(s2.bn_state),
                    jax.tree.leaves(s1.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # the updated state must STAY channel-sharded (out_shardings contract)
    assert s2.params["enc"][3]["w"].addressable_shards[0].data.shape \
        == (5, 5, 64, 16)


def test_dp_tp_2d_mesh_matches_single_device(rng):
    """2-D (data=2, model=4) mesh: batch shards on data, channels on model;
    sync-BN still reduces over the global batch."""
    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.01)
    batch = _batch(rng)
    key = jax.random.key(1)

    s1, a1 = make_train_step(cfg, opt)(
        create_train_state(jax.random.key(0), cfg, opt),
        {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = tp.make_2d_mesh(2, 4)
    st = tp.shard_state(create_train_state(jax.random.key(0), cfg, opt), mesh)
    s2, a2 = tp.make_tp_train_step(mesh, cfg, opt)(
        st, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    np.testing.assert_allclose(float(a2["total"]), float(a1["total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(s2.bn_state),
                    jax.tree.leaves(s1.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("device_data", ["on", "off"])
def test_fit_tp_end_to_end(tmp_path, rng, device_data):
    """fit(parallel='tp') trains channel-sharded end-to-end on a 2-D
    (data=2, model=4) mesh: loss finite, checkpoint written, validation
    runs (compute-follows-data eval on the sharded params).  Covers both
    input pipelines: device-resident P("data") gathers and host-fed
    shard_batch placement."""
    import os

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
    mesh = tp.make_2d_mesh(2, 4)
    state = fit(TrainOptions(
        train_folder=train_dir, valid_folder=train_dir, label="tp",
        epoch=1, batch_size=2, val_interval=1,
        ckpt_dir=str(tmp_path / "CKPT"), log_dir=str(tmp_path / "LOG"),
        load_path="none", progress=False, mesh=mesh, parallel="tp",
        device_data=device_data,
    ), cfg)
    assert int(state.step) == 2  # 2 songs * 2 samples / batch 2
    # params stayed channel-sharded through the loop
    assert state.params["enc"][3]["w"].addressable_shards[0].data.shape \
        == (5, 5, 64, 32)
    assert os.path.exists(str(tmp_path / "CKPT" / "svs_tp.ckpt"))
    log = open(str(tmp_path / "LOG" / "log_tp.txt")).read().splitlines()
    assert any(l.startswith("Val ") for l in log)

    if device_data == "on":
        # resume under TP: the checkpoint loads host-side (before
        # shard_state), re-shards, and continues from epoch 1 — the resumed
        # params must round-trip the save exactly (msgpack is lossless and
        # epoch 2's first step starts from the epoch-1 state)
        state2 = fit(TrainOptions(
            train_folder=train_dir, valid_folder=train_dir, label="tp2",
            epoch=2, batch_size=2, val_interval=2,
            ckpt_dir=str(tmp_path / "CKPT"), log_dir=str(tmp_path / "LOG"),
            load_path=str(tmp_path / "CKPT" / "svs_tp.ckpt"),
            progress=False, mesh=mesh, parallel="tp",
            device_data=device_data,
        ), cfg)
        assert int(state2.step) == 4  # 2 resumed + 2 new (epoch 2 only)
        assert state2.params["enc"][3]["w"].addressable_shards[0] \
            .data.shape == (5, 5, 64, 32)


def test_tp_apply_matches_unsharded(rng):
    cfg = SVSConfig(input_len=64)
    st = create_train_state(jax.random.key(0), cfg)
    mix = rng.random((8, 512, 64)).astype(np.float32)

    want, _ = unet.apply(st.params, st.bn_state, jnp.asarray(mix),
                         train=False, cfg=cfg)

    mesh = tp.make_2d_mesh(1, 8)
    sp = tp.shard_state(st, mesh)
    got = tp.make_tp_apply(mesh, cfg)(sp.params, sp.bn_state,
                                      jnp.asarray(mix))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
