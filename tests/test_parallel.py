"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4):
data-parallel training must be numerically equivalent to single-device
training on the same global batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.models import unet
from svs_tpu.parallel import dp, mesh as mesh_lib
from svs_tpu.train.step import create_train_state, make_optimizer, make_train_step
from svs_tpu.utils.config import SVSConfig


def _batch(rng, b=8, t=64):
    mix = rng.random((b, 512, t)).astype(np.float32)
    voc = (mix * 0.5).astype(np.float32)
    ang = ((rng.random((b, 512, t)) - 0.5) * 6).astype(np.float32)
    return {"mix": mix, "voc": voc, "mix_angle": ang, "voc_angle": ang}


def test_mesh_has_8_devices():
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_matches_single_device(rng):
    """Gradient-allreduce correctness: with SGD the post-step params are a
    direct image of the gradients (Adam at step 1 is sign-descent, which
    amplifies reduction-order noise on near-zero grads into O(lr) diffs —
    ill-conditioned for an equivalence test)."""
    import optax
    cfg = SVSConfig(dropout_rate=0.0)  # deterministic: no dropout
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.01)
    mesh = mesh_lib.make_mesh()

    state = create_train_state(jax.random.key(0), cfg, opt)
    batch = _batch(rng)
    key = jax.random.key(1)

    single_step = make_train_step(cfg, opt)
    s_single, aux_single = single_step(
        state, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    dp_step = dp.make_dp_train_step(mesh, cfg, opt)
    state_r = dp.replicate_state(create_train_state(jax.random.key(0), cfg,
                                                    opt), mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    s_dp, aux_dp = dp_step(state_r, sharded, key)

    np.testing.assert_allclose(float(aux_dp["total"]),
                               float(aux_single["total"]), rtol=1e-5)
    # updated params identical up to f32 reduction-order noise
    # (global-batch BN + global-mean loss)
    for a, b in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(s_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    # BN running stats also identical (sync-BN)
    for a, b in zip(jax.tree.leaves(s_dp.bn_state),
                    jax.tree.leaves(s_single.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_dp_step_multiple_steps_stable(rng):
    cfg = SVSConfig(dropout_rate=0.0)
    opt = make_optimizer(cfg)
    mesh = mesh_lib.make_mesh()
    dp_step = dp.make_dp_train_step(mesh, cfg, opt)
    state = dp.replicate_state(create_train_state(jax.random.key(0), cfg, opt),
                               mesh)
    key = jax.random.key(2)
    losses = []
    for i in range(3):
        key, sub = jax.random.split(key)
        sharded = mesh_lib.shard_batch(mesh, _batch(rng))
        state, aux = dp_step(state, sharded, sub)
        losses.append(float(aux["total"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3


def test_shard_batch_pads_remainder():
    mesh = mesh_lib.make_mesh()
    batch = _batch(np.random.default_rng(0), b=5)
    sharded = mesh_lib.shard_batch(mesh, batch)
    assert sharded["mix"].shape[0] == 8  # padded to mesh size
    np.testing.assert_array_equal(np.asarray(sharded["mix"][5:]), 0.0)
    np.testing.assert_array_equal(np.asarray(sharded["weight"]),
                                  [1, 1, 1, 1, 1, 0, 0, 0])


def test_remainder_batch_exact(rng):
    """B=5 on 8 devices must equal the unpadded single-device step EXACTLY
    (up to f32 reduction order): padded examples carry weight 0 and are
    excluded from the loss means, MR-STFT norms and BN batch statistics —
    no silent double-weighting of the epoch tail (VERDICT r1 weak #6)."""
    import optax
    cfg = SVSConfig(dropout_rate=0.0)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=0.01)
    mesh = mesh_lib.make_mesh()
    batch = _batch(rng, b=5)
    key = jax.random.key(1)

    single_step = make_train_step(cfg, opt)
    s_single, aux_single = single_step(
        create_train_state(jax.random.key(0), cfg, opt),
        {k: jnp.asarray(v) for k, v in batch.items()}, key)

    dp_step = dp.make_dp_train_step(mesh, cfg, opt)
    state_r = dp.replicate_state(create_train_state(jax.random.key(0), cfg,
                                                    opt), mesh)
    s_dp, aux_dp = dp_step(state_r, mesh_lib.shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(aux_dp["total"]),
                               float(aux_single["total"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(s_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(s_dp.bn_state),
                    jax.tree.leaves(s_single.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sp_separate_matches_unsharded(rng):
    cfg = SVSConfig()
    mesh = mesh_lib.make_mesh()
    params, bn_state = unet.init(jax.random.key(0))
    segs = rng.random((8, 512, 128)).astype(np.float32)

    fn = dp.make_sp_separate(mesh, cfg)
    sharded = jax.device_put(segs, mesh_lib.batch_sharded(mesh))
    out = np.asarray(fn(params, bn_state, sharded))

    mask, _ = unet.apply(params, bn_state, jnp.asarray(segs), train=False,
                         cfg=cfg)
    expected = np.asarray(mask) * segs
    np.testing.assert_allclose(out, expected, atol=2e-5)
