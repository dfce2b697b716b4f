"""Halo-exchange time sharding: the sharded whole-song forward must equal
the unsharded forward on the same (long) patch — this single equivalence
covers the halo arithmetic of all 12 conv levels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.models import unet
from svs_tpu.parallel import halo, mesh as mesh_lib
from svs_tpu.utils.config import SVSConfig


def test_time_sharded_equals_unsharded(rng):
    cfg = SVSConfig()
    mesh = mesh_lib.make_mesh()  # 8 CPU devices
    params, bn_state = unet.init(jax.random.key(0), cfg)

    t = 64 * 8 * 2  # 2 granules: 1024 frames, T_loc=128
    mix = rng.random((1, 512, t)).astype(np.float32)

    sharded = halo.make_time_sharded_apply(mesh, cfg)
    got = np.asarray(sharded(params, bn_state, jnp.asarray(mix)))

    want, _ = unet.apply(params, bn_state, jnp.asarray(mix), train=False,
                         cfg=cfg)
    want = np.asarray(want)
    assert got.shape == want.shape == (1, 512, t)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_time_sharded_single_device(rng):
    """n=1 mesh degenerates to plain zero padding."""
    cfg = SVSConfig()
    mesh = mesh_lib.make_mesh(1)
    params, bn_state = unet.init(jax.random.key(1), cfg)
    mix = rng.random((1, 512, 128)).astype(np.float32)
    got = np.asarray(halo.make_time_sharded_apply(mesh, cfg)(
        params, bn_state, jnp.asarray(mix)))
    want, _ = unet.apply(params, bn_state, jnp.asarray(mix), train=False,
                         cfg=cfg)
    np.testing.assert_allclose(got, np.asarray(want), atol=3e-5)


def _loss_batch(rng, b, t):
    return {
        "mix": rng.random((b, 512, t)).astype(np.float32),
        "voc": rng.random((b, 512, t)).astype(np.float32) * 0.5,
        "mix_angle": (rng.random((b, 512, t)).astype(np.float32) - 0.5) * 6,
        "voc_angle": (rng.random((b, 512, t)).astype(np.float32) - 0.5) * 6,
    }


def test_cp_train_step_matches_unsharded(rng):
    """Full context-parallel training STEP (time-sharded conv tower, global
    BN, dropout on, Adam) vs the unsharded single-device step on the same
    batch: loss/grad-norm/BN agree at f32 reduction-noise level; post-Adam
    params within the first-step sign-flip envelope (see dryrun notes)."""
    from svs_tpu.parallel import dp
    from svs_tpu.train.step import (create_train_state, make_optimizer,
                                    make_train_step)

    cfg = SVSConfig(input_len=256, dropout_rate=0.5)
    mesh = mesh_lib.make_mesh(4)  # T_loc = 64: the minimum legal shard
    opt = make_optimizer(cfg)
    state0 = create_train_state(jax.random.key(0), cfg, opt)
    batch = _loss_batch(rng, 2, 256)

    cp_step = halo.make_cp_train_step(mesh, cfg, opt)
    state_cp, aux_cp = cp_step(dp.replicate_state(state0, mesh),
                               halo.shard_batch_time(mesh, batch),
                               jax.random.key(1))

    ref_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    ref_batch["weight"] = jnp.ones((2,), jnp.float32)
    state1, aux1 = make_train_step(cfg, opt)(
        create_train_state(jax.random.key(0), cfg, opt), ref_batch,
        jax.random.key(1))

    np.testing.assert_allclose(float(aux_cp["total"]), float(aux1["total"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(aux_cp["grad_norm"]),
                               float(aux1["grad_norm"]), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(state_cp.bn_state),
                    jax.tree.leaves(state1.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
    # post-Adam params: near-zero grads legitimately flip update sign under
    # f32 reduction reordering (update ~ lr*sign(g) on step 1), so bound max
    # by the 2*lr envelope and the mean much tighter
    leaves = [(np.asarray(a), np.asarray(c))
              for a, c in zip(jax.tree.leaves(state_cp.params),
                              jax.tree.leaves(state1.params))]
    assert max(float(np.max(np.abs(a - c))) for a, c in leaves) <= 2.1e-3
    mean_d = (sum(float(np.sum(np.abs(a - c))) for a, c in leaves)
              / sum(a.size for a, _ in leaves))
    assert mean_d < 2e-4
    assert int(state_cp.step) == 1


@pytest.mark.slow
def test_cp_loss_gradient_parity_f64(rng):
    """The strong proof: in float64 (where ReLU-kink chaos vanishes) the
    context-parallel loss gradients equal the unsharded gradients to ~1e-9 —
    halo exchange, psum'd BN batch stats, shard-invariant dropout and the
    pmean/all-gather transpose are all exactly right."""
    import contextlib
    import dataclasses

    from svs_tpu.losses.mrstft import combined_loss

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        cfg = SVSConfig(input_len=256, dropout_rate=0.5,
                        compute_dtype="float64", mr_mag_impl="fft")
        mesh = mesh_lib.make_mesh(4)
        params, bn_state = unet.init(jax.random.key(0), cfg)
        params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        bn_state = jax.tree.map(lambda a: np.asarray(a, np.float64), bn_state)
        batch = {k: np.asarray(v, np.float64)
                 for k, v in _loss_batch(rng, 2, 256).items()}
        batch["weight"] = np.ones((2,), np.float64)
        key = jax.random.key(3)

        cp_loss = halo.make_cp_loss(mesh, cfg)
        sharded = halo.shard_batch_time(mesh, batch)
        g_cp, (bn_cp, aux_cp) = jax.grad(cp_loss, has_aux=True)(
            params, bn_state, sharded, key)

        def ref_loss(p, s, b, k):
            mask, new_bn = unet.apply(p, s, b["mix"], train=True,
                                      dropout_rng=k, cfg=cfg,
                                      weight=b["weight"])
            total, aux = combined_loss(mask, b["mix"], b["voc"],
                                       b["mix_angle"], b["voc_angle"], cfg,
                                       weight=b["weight"])
            return total, (new_bn, aux)

        g_ref, (bn_ref, aux_ref) = jax.grad(ref_loss, has_aux=True)(
            params, bn_state, batch, key)

        np.testing.assert_allclose(float(aux_cp["total"]),
                                   float(aux_ref["total"]), rtol=1e-12)
        for a, c in zip(jax.tree.leaves(g_cp), jax.tree.leaves(g_ref)):
            a, c = np.asarray(a), np.asarray(c)
            # conv-bias grads are ~0 (BN re-centres), so floor the relative
            # scale at 1.0 — the check is then effectively absolute 1e-9
            # for near-zero leaves and relative 1e-9 for O(1)+ leaves
            scale = max(float(np.max(np.abs(c))), 1.0)
            assert float(np.max(np.abs(a - c))) / scale < 1e-9
        for a, c in zip(jax.tree.leaves(bn_cp), jax.tree.leaves(bn_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-10, atol=1e-12)


def test_cp_train_step_weighted_remainder(rng):
    """Zero-weight padded rows drop out of the CP step exactly: a 3-row
    batch with weight [1,1,0] produces the same loss as the 2-row batch."""
    from svs_tpu.parallel import dp
    from svs_tpu.train.step import create_train_state, make_optimizer

    cfg = SVSConfig(input_len=256, dropout_rate=0.0)
    mesh = mesh_lib.make_mesh(4)
    opt = make_optimizer(cfg)
    batch2 = _loss_batch(rng, 2, 256)
    batch3 = {k: np.concatenate([v, np.zeros_like(v[:1])]) for k, v in
              batch2.items()}
    batch3["weight"] = np.asarray([1.0, 1.0, 0.0], np.float32)

    # fresh state per call: the step DONATES its input state (a replicated
    # device_put may alias the source buffer, so reusing one base state
    # across two donating calls would read deleted arrays)
    cp_step = halo.make_cp_train_step(mesh, cfg, opt)
    _, aux2 = cp_step(
        dp.replicate_state(create_train_state(jax.random.key(0), cfg, opt),
                           mesh),
        halo.shard_batch_time(mesh, batch2), jax.random.key(1))
    cp_step3 = halo.make_cp_train_step(mesh, cfg, opt)
    _, aux3 = cp_step3(
        dp.replicate_state(create_train_state(jax.random.key(0), cfg, opt),
                           mesh),
        halo.shard_batch_time(mesh, batch3), jax.random.key(1))
    np.testing.assert_allclose(float(aux3["total"]), float(aux2["total"]),
                               rtol=1e-6)
@pytest.mark.slow


def test_fit_cp_end_to_end(tmp_path, rng):
    """fit(parallel='cp') trains time-sharded end-to-end: loss finite,
    checkpoint written, validation runs (unsharded eval on the replicated
    state)."""
    import os

    from svs_tpu.train.loop import TrainOptions, fit

    train_dir = str(tmp_path / "spec")
    for folder in ("mixture", "vocal"):
        os.makedirs(os.path.join(train_dir, folder), exist_ok=True)
    for i in range(2):
        base = f"{i:04d}_s{i}"
        for folder in ("mixture", "vocal"):
            np.save(os.path.join(train_dir, folder, f"{base}_spec.npy"),
                    rng.random((513, 300)).astype(np.float32))
            ang = rng.random((513, 300)).astype(np.float32) * 6 - 3
            np.save(os.path.join(train_dir, folder, f"{base}_phase.npy"),
                    np.exp(1j * ang).astype(np.complex64))

    cfg = SVSConfig(input_len=256, samples_per_song=2, dropout_rate=0.0)
    mesh = mesh_lib.make_mesh(4)
    state = fit(TrainOptions(
        train_folder=train_dir, valid_folder=train_dir, label="cp",
        epoch=1, batch_size=2, val_interval=1,
        ckpt_dir=str(tmp_path / "CKPT"), log_dir=str(tmp_path / "LOG"),
        load_path="none", progress=False, mesh=mesh, parallel="cp",
    ), cfg)
    assert int(state.step) == 2  # 2 songs * 2 samples / batch 2
    assert os.path.exists(str(tmp_path / "CKPT" / "svs_cp.ckpt"))
    log = open(str(tmp_path / "LOG" / "log_cp.txt")).read().splitlines()
    assert any(l.startswith("Val ") for l in log)


def test_shard_batch_time_validates_granularity(rng):
    mesh = mesh_lib.make_mesh(4)
    batch = _loss_batch(rng, 1, 128)  # 128 % (64*4) != 0
    try:
        halo.shard_batch_time(mesh, batch)
        raise AssertionError("expected granularity ValueError")
    except ValueError as e:
        assert "multiple of 256" in str(e)


def test_separate_magnitude_time_sharded(rng):
    cfg = SVSConfig()
    mesh = mesh_lib.make_mesh()
    params, bn_state = unet.init(jax.random.key(0), cfg)
    mag = rng.random((513, 700)).astype(np.float32)  # odd length -> pad path
    out = halo.separate_magnitude_time_sharded(params, bn_state, mag, mesh,
                                               cfg=cfg)
    assert out.shape == (513, 700)
    assert (out[0] == 0).all()           # DC row zeroed
    assert (out[1:] <= mag[1:] + 1e-5).all()  # sigmoid mask in [0,1]
    # complementary mask path
    acc = halo.separate_magnitude_time_sharded(params, bn_state, mag, mesh,
                                               cfg=cfg, vocal_solo=False)
    np.testing.assert_allclose(out[1:] + acc[1:], mag[1:], atol=1e-5)


def test_cp_train_remat_same_numerics(rng):
    """cfg.remat now threads through the CP forward (jax.checkpoint per
    level, halo.py) — previously silently ignored, leaving the fine_tune
    preset's remat=True without effect under --cp.  Remat recomputes the
    same ops, so loss and gradients must match the non-remat CP loss."""
    import dataclasses

    from svs_tpu.train.step import create_train_state

    cfg = SVSConfig(input_len=128, dropout_rate=0.5)
    mesh = mesh_lib.make_mesh(2)
    state = create_train_state(jax.random.key(0), cfg)
    batch = _loss_batch(rng, 2, 128)
    sb = halo.shard_batch_time(mesh, batch)

    results = {}
    for remat in (False, True):
        loss_fn = halo.make_cp_loss(mesh, dataclasses.replace(cfg,
                                                              remat=remat))

        def f(params):
            total, _ = loss_fn(params, state.bn_state, sb, jax.random.key(1))
            return total

        val, grads = jax.jit(jax.value_and_grad(f))(state.params)
        results[remat] = (float(val), jax.tree.leaves(grads))

    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-6)
    # atol 1e-5: near-zero grads carry bf16 recompute noise at the 1e-6
    # scale (remat re-runs the bf16 convs; XLA may fuse the recompute
    # differently); structurally nonzero grads must agree to 0.1%
    for a, b in zip(results[False][1], results[True][1]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)
