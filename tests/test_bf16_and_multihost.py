"""bfloat16 training config + multi-host input helpers."""

import numpy as np

import jax
import jax.numpy as jnp

from svs_tpu.parallel import mesh as mesh_lib, multihost
from svs_tpu.train.step import create_train_state, make_optimizer, make_train_step
from svs_tpu.utils.config import SVSConfig


def test_bf16_train_step_finite_and_learns(rng):
    """MXU-dtype training: conv compute in bfloat16 with f32 params/accum."""
    cfg = SVSConfig(compute_dtype="bfloat16", dropout_rate=0.0)
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.key(0), cfg, opt)
    step = make_train_step(cfg, opt)
    mix = rng.random((2, 512, 128)).astype(np.float32)
    batch = {"mix": jnp.asarray(mix),
             "voc": jnp.asarray(mix * 0.5),
             "mix_angle": jnp.zeros((2, 512, 128)),
             "voc_angle": jnp.zeros((2, 512, 128))}
    losses = []
    key = jax.random.key(1)
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["total"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # params remain f32 (bf16 is compute-only)
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(state.params))


def test_process_shard_single_process():
    items = list(range(10))
    assert multihost.process_shard(items) == items  # 1 process -> everything
    assert multihost.process_shard(items, 1, 4) == [1, 5, 9]
    # shards partition the list
    parts = [multihost.process_shard(items, i, 3) for i in range(3)]
    assert sorted(sum(parts, [])) == items


def test_global_batch_from_local(rng):
    mesh = mesh_lib.make_mesh()
    local = {"mix": rng.random((8, 16, 8)).astype(np.float32)}
    out = multihost.global_batch_from_local(mesh, local)
    arr = out["mix"]
    assert arr.shape == (8, 16, 8)  # single process: global == local
    np.testing.assert_allclose(np.asarray(arr), local["mix"])
    assert len(arr.sharding.device_set) == 8


def test_global_batch_from_local_pad_to(rng):
    """pad_to zero-pads local rows to a fixed target and attaches the 0/1
    weight vector (drop-free remainder policy for multi-host batches)."""
    mesh = mesh_lib.make_mesh()
    local = {"mix": rng.random((5, 16, 8)).astype(np.float32)}
    out = multihost.global_batch_from_local(mesh, local, pad_to=8)
    assert out["mix"].shape == (8, 16, 8)
    np.testing.assert_allclose(np.asarray(out["mix"])[:5], local["mix"])
    np.testing.assert_allclose(np.asarray(out["mix"])[5:], 0.0)
    np.testing.assert_allclose(np.asarray(out["weight"]),
                               [1, 1, 1, 1, 1, 0, 0, 0])

    # pad_to must respect the host's device quota
    import pytest
    with pytest.raises(ValueError):
        multihost.global_batch_from_local(mesh, local, pad_to=9)
    with pytest.raises(ValueError):
        multihost.global_batch_from_local(
            mesh, {"mix": local["mix"][:3]}, pad_to=2)  # rows > pad_to


def test_global_batch_from_global_matches_shard_batch(rng):
    """The multi-host validation distributor is bit-identical to the
    single-host shard_batch path: same padding, same weights, and the eval
    step computes the same global loss on either placement."""
    from svs_tpu.train.step import make_eval_step

    mesh = mesh_lib.make_mesh()
    cfg = SVSConfig(input_len=64, dropout_rate=0.0)
    state = create_train_state(jax.random.key(0), cfg, make_optimizer(cfg))

    batch = {k: rng.random((5, 512, 64)).astype(np.float32)
             for k in ("mix", "voc", "mix_angle", "voc_angle")}
    via_global = multihost.global_batch_from_global(mesh, batch)
    via_shard = mesh_lib.shard_batch(mesh, batch)
    for k in via_shard:
        np.testing.assert_array_equal(np.asarray(via_global[k]),
                                      np.asarray(via_shard[k]))

    eval_step = make_eval_step(cfg)
    a = float(eval_step(state, via_global)["total"])
    b = float(eval_step(state, via_shard)["total"])
    assert a == b


def test_global_batch_from_global_pad_rows_to(rng):
    """pad_rows_to keeps remainder batches at the full-batch global shape
    (one eval jit signature) with zero-weight padding."""
    mesh = mesh_lib.make_mesh()
    batch = {"mix": rng.random((5, 16, 8)).astype(np.float32)}
    out = multihost.global_batch_from_global(mesh, batch, pad_rows_to=32)
    assert out["mix"].shape == (32, 16, 8)
    w = np.asarray(out["weight"])
    np.testing.assert_allclose(w[:5], 1.0)
    np.testing.assert_allclose(w[5:], 0.0)
