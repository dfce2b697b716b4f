"""Tensor (channel) parallelism via GSPMD sharding annotations.

The reference has no model-parallel story at all (single device pick,
reference train.py:19); this is a first-class new capability, done the
TPU way: no hand-written collectives, no module surgery.  Conv kernels are
sharded on their channel dimensions over a ``model`` mesh axis, per-channel
vectors (bias / BN scale / BN stats / Adam moments) shard with them, and the
XLA SPMD partitioner derives every data movement — the forward/backward
convs run channel-partitioned on each chip and XLA inserts the minimal
all-gathers/reduce-scatters where a layer boundary (skip concat, the
1-channel edges) changes the partitioning.  This is the "annotate shardings,
let XLA insert collectives" recipe, applied to the U-Net's channel axis.

Sharding rule (uniform over params, BN state and optimizer moments, so the
Adam update stays local to each shard):

- HWIO conv kernels: shard O when divisible by the model-axis size, else I
  when divisible (dec6's 1-channel-output kernel shards on its 32 input
  channels), else replicate (nothing in the stock geometry hits this).
- per-channel vectors: shard dim 0 when divisible, else replicate
  (dec6's 1-channel bias).
- scalars (step counter, Adam count, injected LR): replicate.

Composes with data parallelism on a 2-D ``(data, model)`` mesh: the batch
shards on ``data``, channels on ``model``; BN batch statistics still reduce
over the global batch (sync-BN) because the mean/var reductions cross the
sharded batch axis inside one jit program.

Multi-host meshes work when the ``model`` axis stays within each host (so
TP's per-layer activation movement rides ICI while only the once-per-step
gradient reduction crosses DCN) — :func:`make_2d_mesh`'s process-major
device order gives that layout, ``fit`` checks it loudly, batches arrive
through the same global distributors as multi-host DP, and checkpoint
writes gather collectively first (``multihost.gather_state``; TP state is
data-replicated but lives as global arrays over all hosts' devices).
Proven 2-process in tests/test_multiprocess.py::test_two_process_tp_fit_matches_dp.

When to use: at the reference's 9.6M-param scale pure DP dominates (params
fit HBM thousands of times over); TP exists for scaled-up variants — wider
channel multipliers or long fine_tune patches where per-chip activation
memory, not FLOPs, is the binding constraint.  docs/ARCHITECTURE.md
"Parallelism" discusses the crossover.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svs_tpu.models import unet
from svs_tpu.train.step import TrainState, make_optimizer, make_step_fn
from svs_tpu.utils.config import SVSConfig


def make_2d_mesh(n_data: int, n_model: int,
                 data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """``(data, model)`` mesh over the first ``n_data*n_model`` devices.

    The model axis should map to the fastest interconnect (innermost ICI
    ring): TP moves activations every layer, DP moves gradients once per
    step.  ``jax.devices()`` order already walks the ICI torus minor-first
    on TPU, so taking devices in order does the right thing.
    """
    if n_data < 1 or n_model < 1:
        raise ValueError(f"mesh dims must be positive, got "
                         f"({n_data}, {n_model})")
    devs = jax.devices()
    need = n_data * n_model
    if need > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"only {len(devs)} present")
    arr = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(arr, (data_axis, model_axis))


def leaf_spec(shape, tp: int, model_axis: str) -> P:
    """The uniform channel-sharding rule (module docstring).

    Shared with ``parallel/zero.py`` (ZeRO-1/FSDP use the same
    channel-targeted rule over the ``data`` axis): HWIO kernels shard O
    when divisible else I — never the 5x5 spatial dims — and per-channel
    vectors shard dim 0."""
    if tp <= 1:
        return P()
    if len(shape) == 4:  # HWIO conv kernel
        if shape[3] % tp == 0 and shape[3] >= tp:
            return P(None, None, None, model_axis)
        if shape[2] % tp == 0 and shape[2] >= tp:
            return P(None, None, model_axis, None)
    if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= tp:
        return P(model_axis)
    return P()


def tree_shardings(tree, mesh: Mesh, model_axis: str = "model"):
    """Same-shaped tree of NamedShardings under the channel rule.

    Applies uniformly to params, BN state and optimizer state: Adam's mu/nu
    mirror the param tree leaf-for-leaf, so the same shape-driven rule keeps
    each moment co-sharded with its parameter and the optimizer update fully
    local.  Accepts concrete arrays or ShapeDtypeStructs.
    """
    tp = mesh.shape[model_axis] if model_axis in mesh.axis_names else 1
    return jax.tree.map(
        lambda l: NamedSharding(mesh, leaf_spec(l.shape, tp, model_axis)),
        tree)


def shard_state(state: TrainState, mesh: Mesh,
                model_axis: str = "model") -> TrainState:
    """Place a host/replicated TrainState onto the mesh, channel-sharded."""
    return jax.tree.map(jax.device_put, state,
                        tree_shardings(state, mesh, model_axis))


def make_tp_train_step(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Jitted ``step(state, batch, rng) -> (state, metrics)`` with channels
    sharded on ``model_axis`` and (when the mesh has one) the batch sharded
    on ``data_axis``.

    Feed it a state placed by :func:`shard_state`; the in/out shardings are
    derived from the same channel rule, so the updated state stays sharded
    in place (donated buffers, like the unsharded step).  Semantics are
    identical to ``make_train_step`` — tests pin loss, grads, params and
    sync-BN stats against the single-device step (tests/test_tp.py).
    """
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)

    from svs_tpu.train.step import create_train_state

    shapes = jax.eval_shape(
        lambda: create_train_state(jax.random.key(0), cfg, optimizer))
    st_sh = tree_shardings(shapes, mesh, model_axis)
    batch_sh = NamedSharding(
        mesh, P(data_axis) if data_axis in mesh.axis_names else P())
    rep = NamedSharding(mesh, P())

    return jax.jit(
        make_step_fn(cfg, optimizer),
        in_shardings=(st_sh, batch_sh, rep),
        out_shardings=(st_sh, None),
        donate_argnums=(0,),
    )


def make_tp_apply(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Channel-sharded forward ``fn(params, bn_state, mix) -> mask`` (eval
    mode).  Compute follows data: pass params/BN already placed by
    :func:`shard_state`'s rule (or any committed sharding) and jit runs the
    forward under those shardings; the input is placed batch-sharded on
    ``data_axis`` when the mesh has one, replicated otherwise."""
    cfg = cfg or SVSConfig()
    in_sh = NamedSharding(
        mesh, P(data_axis) if data_axis in mesh.axis_names else P())

    @jax.jit
    def _fwd(params, bn_state, mix):
        mask, _ = unet.apply(params, bn_state, mix, train=False, cfg=cfg)
        return mask

    def fwd(params, bn_state, mix):
        return _fwd(params, bn_state, jax.device_put(mix, in_sh))

    return fwd
