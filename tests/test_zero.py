"""ZeRO-1 optimizer-state sharding (parallel/zero.py): the moments must
actually shard, and the step must reproduce plain DP / single-device
training exactly (same step fn, different layout)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svs_tpu.parallel import mesh as mesh_lib, zero
from svs_tpu.train.step import create_train_state, make_train_step
from svs_tpu.utils.config import SVSConfig


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _batch(rng, b=8, t=64):
    mix = rng.random((b, 512, t)).astype(np.float32)
    voc = (mix * 0.5).astype(np.float32)
    ang = ((rng.random((b, 512, t)) - 0.5) * 6).astype(np.float32)
    return {"mix": mix, "voc": voc, "mix_angle": ang, "voc_angle": ang}


def test_moments_shard_for_real():
    """Adam's mu/nu leaves carry the data-axis split (the shared channel
    rule, tp.leaf_spec: O-dim for these kernels); params stay replicated."""
    cfg = SVSConfig(input_len=64)
    mesh = mesh_lib.make_mesh()
    st = zero.shard_state(create_train_state(jax.random.key(0), cfg), mesh)
    n = mesh.devices.size
    kernel_moments = [l for l in jax.tree.leaves(st.opt_state)
                      if getattr(l, "ndim", 0) == 4
                      and l.shape == (5, 5, 64, 128)]
    assert kernel_moments, "expected Adam moments mirroring the enc4 kernel"
    for m in kernel_moments:
        assert m.addressable_shards[0].data.shape == (5, 5, 64, 128 // n)
    # params replicated: full shape on every device
    w = st.params["enc"][3]["w"]
    assert w.addressable_shards[0].data.shape == (5, 5, 64, 128)
    # scalar leaves (count, injected lr) replicate
    assert all(l.addressable_shards[0].data.shape == ()
               for l in jax.tree.leaves(st.opt_state)
               if getattr(l, "ndim", None) == 0)


def test_zero1_step_matches_single_device(rng):
    """One Adam step with ZeRO-1 layout == the unsharded step: loss and
    grad norm tight; params within the Adam first-step sign-descent
    envelope (the dryrun's bound — reduction-order noise on near-zero
    grads can flip a sign at most 2*lr apart)."""
    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    batch = _batch(rng)
    key = jax.random.key(1)

    s1, a1 = make_train_step(cfg)(
        create_train_state(jax.random.key(0), cfg),
        {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = mesh_lib.make_mesh()
    st = zero.shard_state(create_train_state(jax.random.key(0), cfg), mesh)
    step = zero.make_zero1_train_step(mesh, cfg)
    s2, a2 = step(st, mesh_lib.shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(a2["total"]), float(a1["total"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(a2["grad_norm"]),
                               float(a1["grad_norm"]), rtol=1e-3)
    leaves = [(np.asarray(a), np.asarray(b))
              for a, b in zip(jax.tree.leaves(s2.params),
                              jax.tree.leaves(s1.params))]
    lr = cfg.learning_rate
    assert max(float(np.max(np.abs(a - b))) for a, b in leaves) <= 2.1 * lr
    assert (sum(float(np.sum(np.abs(a - b))) for a, b in leaves)
            / sum(a.size for a, _ in leaves)) < 2e-4
    for a, b in zip(jax.tree.leaves(s2.bn_state),
                    jax.tree.leaves(s1.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    # the updated opt state STAYS ZeRO-sharded (out_shardings contract)
    n = mesh.devices.size
    m = [l for l in jax.tree.leaves(s2.opt_state)
         if getattr(l, "ndim", 0) == 4 and l.shape == (5, 5, 64, 128)][0]
    assert m.addressable_shards[0].data.shape == (5, 5, 64, 128 // n)


def test_fsdp_params_shard_and_step_matches(rng):
    """fsdp=True: params and BN shard by the same rule (per-chip bytes
    drop), and the step still reproduces the single-device program."""
    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    batch = _batch(rng)
    key = jax.random.key(1)
    mesh = mesh_lib.make_mesh()
    n = mesh.devices.size

    st = zero.shard_state(create_train_state(jax.random.key(0), cfg), mesh,
                          fsdp=True)
    # enc4 kernel (5,5,64,128): the channel rule shards the O dim
    w = st.params["enc"][3]["w"]
    assert w.addressable_shards[0].data.shape == (5, 5, 64, 128 // n)
    # per-channel vectors shard on dim 0 (enc6's BN scale is (512,))
    assert st.params["enc"][5]["scale"].addressable_shards[0] \
        .data.shape == (512 // n,)

    s1, a1 = make_train_step(cfg)(
        create_train_state(jax.random.key(0), cfg),
        {k: jnp.asarray(v) for k, v in batch.items()}, key)
    step = zero.make_zero1_train_step(mesh, cfg, fsdp=True)
    s2, a2 = step(st, mesh_lib.shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(a2["total"]), float(a1["total"]),
                               rtol=1e-5)
    leaves = [(np.asarray(a), np.asarray(b))
              for a, b in zip(jax.tree.leaves(s2.params),
                              jax.tree.leaves(s1.params))]
    lr = cfg.learning_rate
    assert max(float(np.max(np.abs(a - b))) for a, b in leaves) <= 2.1 * lr
    assert (sum(float(np.sum(np.abs(a - b))) for a, b in leaves)
            / sum(a.size for a, _ in leaves)) < 2e-4
    # params STAY sharded through the step
    assert s2.params["enc"][3]["w"].addressable_shards[0].data.shape \
        == (5, 5, 64, 128 // n)


def test_zero1_multi_step_trajectory_matches_dp(rng):
    """Three consecutive steps: ZeRO-1 and plain DP produce the same loss
    trajectory (same program semantics, different moment layout)."""
    from svs_tpu.parallel import dp

    cfg = SVSConfig(dropout_rate=0.0, input_len=64)
    mesh = mesh_lib.make_mesh()

    st_dp = dp.replicate_state(create_train_state(jax.random.key(0), cfg),
                               mesh)
    st_z = zero.shard_state(create_train_state(jax.random.key(0), cfg),
                            mesh)
    dp_step = dp.make_dp_train_step(mesh, cfg)
    z_step = zero.make_zero1_train_step(mesh, cfg)

    for i in range(3):
        b = mesh_lib.shard_batch(mesh, _batch(rng))
        key = jax.random.key(i)
        st_dp, a_dp = dp_step(st_dp, b, key)
        st_z, a_z = z_step(st_z, b, key)
        np.testing.assert_allclose(float(a_z["total"]), float(a_dp["total"]),
                                   rtol=2e-5, err_msg=f"step {i}")
