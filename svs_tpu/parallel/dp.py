"""Data-parallel training and segment-parallel inference over a mesh.

Train: params/optimizer state replicated, batch sharded on the ``data`` axis;
the loss is a global mean, so XLA's sharding propagation inserts the gradient
all-reduce over ICI automatically (the north-star scale-out config,
BASELINE.json).  Note BatchNorm consequence: batch statistics are computed
over the GLOBAL batch (sync-BN semantics) because the mean/var reductions
cross the sharded axis — stronger than per-replica stats and exactly
reproducible on one device.

Infer: the segment axis of a song is embarrassingly parallel (reference
segments are independent, inference.py:79-116), so whole-song masking shards
segments across chips with zero communication — the TPU-idiomatic
"sequence parallelism" for this fully-convolutional model (SURVEY.md §5
long-context note).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import optax
from jax.sharding import Mesh

from svs_tpu.losses.mrstft import combined_loss
from svs_tpu.models import unet
from svs_tpu.parallel import mesh as mesh_lib
from svs_tpu.train.step import TrainState, make_optimizer
from svs_tpu.utils.config import SVSConfig


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    rep = mesh_lib.replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_dp_train_step(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    axis_name: str = "data",
):
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)`` with
    batch sharded over the mesh and state replicated."""
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    rep = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharded(mesh, axis_name)

    def loss_fn(params, bn_state, batch, rng):
        weight = batch.get("weight")  # 0/1 validity from shard_batch padding
        mask, new_bn = unet.apply(params, bn_state, batch["mix"], train=True,
                                  dropout_rng=rng, cfg=cfg, weight=weight)
        total, aux = combined_loss(mask, batch["mix"], batch["voc"],
                                   batch["mix_angle"], batch["voc_angle"],
                                   cfg, weight=weight)
        return total, (new_bn, aux)

    def _step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        grads, (new_bn, aux) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.bn_state, batch, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        return TrainState(new_params, new_bn, new_opt, state.step + 1), aux

    state_shardings = jax.tree.map(lambda _: rep, _abstract_state_spec())

    # `bsh` is a pytree PREFIX for the whole batch dict: every entry — the
    # four (B, F, T) planes and the optional (B,) weight — shards on dim 0
    return jax.jit(
        _step,
        in_shardings=(state_shardings, bsh, rep),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )


def _abstract_state_spec():
    """A TrainState-shaped tree of placeholders for sharding trees.

    jax.jit accepts a pytree-prefix of shardings; TrainState itself is the
    simplest correct prefix — every leaf replicated.
    """
    return TrainState(params=0, bn_state=0, opt_state=0, step=0)


@functools.lru_cache(maxsize=16)
def make_sp_separate(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    vocal_solo: bool = True,
    axis_name: str = "data",
):
    """Segment-parallel whole-song masking: ``fn(params, bn_state, segs)``
    with ``segs (S, 512, input_len)`` sharded over the mesh on S.

    Cached on (mesh, cfg, vocal_solo, axis_name) so per-song callers
    (``svs-inference --sp``) reuse ONE jit instance and its compile cache
    instead of retracing every call — same reason
    ``halo.make_time_sharded_apply`` is cached."""
    cfg = cfg or SVSConfig()
    rep = mesh_lib.replicated(mesh)
    ssh = mesh_lib.batch_sharded(mesh, axis_name)

    def _mask(params, bn_state, segs):
        mask, _ = unet.apply(params, bn_state, segs, train=False, cfg=cfg)
        if not vocal_solo:
            mask = 1.0 - mask
        return mask * segs

    return jax.jit(_mask, in_shardings=(None, None, ssh), out_shardings=ssh)
