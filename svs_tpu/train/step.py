"""The jitted train / eval steps.

The reference scatters one optimisation step across host-driven torch calls
(forward train.py:274, losses train.py:281-296, backward/step train.py:299-300,
plus a device->host .item() sync every step, train.py:303).  Here the ENTIRE
step — U-Net forward with BN/dropout, mask arithmetic, patch iSTFT, 3-resolution
MR-STFT, backward, Adam update — is one ``jax.jit`` program: a single XLA
compilation, no host round-trips, gradients via ``jax.grad``, Adam via optax
(replacing the optimizer embedded in the model, reference model.py:116).

The learning rate is an optax ``inject_hyperparams`` field so the reference's
manual mid-training LR drop (train.py:251-262) is a cheap state mutation, not
a recompile.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from svs_tpu.losses.mrstft import combined_loss
from svs_tpu.models import unet
from svs_tpu.utils.config import SVSConfig


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def make_optimizer(cfg: Optional[SVSConfig] = None,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8 — reference
    model.py:116 uses torch.optim.Adam(lr=1e-3) defaults).

    ``accum_steps > 1`` wraps it in ``optax.MultiSteps``: each call
    accumulates the gradient and the params update once every
    ``accum_steps`` microbatches with their MEAN gradient — the standard
    large-effective-batch mechanism when the target batch doesn't fit HBM
    (no reference counterpart; it trains at whatever batch fits,
    train.py:396).  Note the checkpoint opt-state layout changes with the
    wrapper, so a run must resume with the same ``accum_steps``.
    """
    cfg = cfg or SVSConfig()
    opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.learning_rate)
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


def create_train_state(
    rng: jax.Array,
    cfg: Optional[SVSConfig] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    params, bn_state = unet.init(rng, cfg)
    return TrainState(params, bn_state, optimizer.init(params),
                      jnp.zeros((), jnp.int32))


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Reference train.py:251-254: manually set the LR mid-training.

    Handles both the bare ``inject_hyperparams`` state and the
    ``optax.MultiSteps`` wrapper (gradient accumulation) — the LR lives
    one level deeper there (``inner_opt_state``)."""
    opt_state = state.opt_state
    wrapped = hasattr(opt_state, "inner_opt_state")
    inner = opt_state.inner_opt_state if wrapped else opt_state
    inner = inner._replace(
        hyperparams={**inner.hyperparams,
                     "learning_rate": jnp.asarray(lr, jnp.float32)}
    )
    opt_state = (opt_state._replace(inner_opt_state=inner) if wrapped
                 else inner)
    return state._replace(opt_state=opt_state)


def reset_accumulation(state: TrainState) -> TrainState:
    """Drop a partially-filled gradient-accumulation cycle (no-op without
    the ``optax.MultiSteps`` wrapper).

    Used by the mid-epoch preemption save: resume re-runs the interrupted
    epoch from its first batch, so a saved half-cycle would average the
    aborted microbatch gradients together with their re-fed copies —
    zeroing ``mini_step``/``acc_grads`` makes the resumed trajectory start
    the cycle cleanly instead."""
    opt = state.opt_state
    if not hasattr(opt, "mini_step"):
        return state
    opt = opt._replace(
        mini_step=jnp.zeros_like(opt.mini_step),
        acc_grads=jax.tree.map(jnp.zeros_like, opt.acc_grads))
    return state._replace(opt_state=opt)


def get_learning_rate(state: TrainState) -> float:
    opt_state = state.opt_state
    if hasattr(opt_state, "inner_opt_state"):
        opt_state = opt_state.inner_opt_state
    return float(opt_state.hyperparams["learning_rate"])


def make_step_fn(cfg: Optional[SVSConfig] = None,
                 optimizer: Optional[optax.GradientTransformation] = None):
    """The UNJITTED ``step(state, batch, rng) -> (state, metrics)`` body —
    one optimisation step as a pure function.  ``make_train_step`` wraps it
    in ``jax.jit``; the epoch-scan path (``train/scan.py``) traces it as a
    ``lax.scan`` body instead, so both modes share one definition."""
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)

    def loss_fn(params, bn_state, batch, rng):
        weight = batch.get("weight")  # optional 0/1 validity (padded batches)
        mask, new_bn = unet.apply(
            params, bn_state, batch["mix"], train=True, dropout_rng=rng,
            cfg=cfg, weight=weight,
        )
        total, aux = combined_loss(
            mask, batch["mix"], batch["voc"],
            batch["mix_angle"], batch["voc_angle"], cfg, weight=weight,
        )
        return total, (new_bn, aux)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        grads, (new_bn, aux) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.bn_state, batch, rng
        )
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bn, new_opt, state.step + 1)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        return new_state, aux

    return step


def make_train_step(cfg: Optional[SVSConfig] = None,
                    optimizer: Optional[optax.GradientTransformation] = None):
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    batch: dict of (B, 512, T) float32 — mix, voc, mix_angle, voc_angle
    (the sampler's output, reference train.py:265-268).
    """
    # donate the input TrainState: params/opt-state buffers are overwritten
    # in place instead of double-buffered (halves peak optimizer memory)
    return jax.jit(make_step_fn(cfg, optimizer), donate_argnums=(0,))


def make_eval_step(cfg: Optional[SVSConfig] = None):
    """Jitted validation step (reference train.py:316-347): eval-mode BN,
    no dropout, same combined loss."""
    cfg = cfg or SVSConfig()

    @jax.jit
    def step(state: TrainState, batch: Dict[str, jax.Array]
             ) -> Dict[str, jax.Array]:
        mask, _ = unet.apply(state.params, state.bn_state, batch["mix"],
                             train=False, cfg=cfg)
        _, aux = combined_loss(
            mask, batch["mix"], batch["voc"],
            batch["mix_angle"], batch["voc_angle"], cfg,
            weight=batch.get("weight"),
        )
        return aux

    return step
