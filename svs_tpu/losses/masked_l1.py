"""Spectrogram-domain mask losses.

The reference's runnable loss path (reference train.py:274-283) is two plain
L1 terms on masked magnitudes; its ``WeightedL1Loss`` class carries two latent
bugs (``self.reduction`` never assigned -> AttributeError at model.py:35, and
a 3-arg signature train.py never satisfies — see SURVEY.md §2 item 8), so the
experiments actually ran ``nn.L1Loss`` (reference config.py:33,44).  Here:

- :func:`masked_l1_pair` is the runnable-path semantics (the default),
- :func:`weighted_l1` is the *intended* weighted loss with the reduction bug
  fixed, offered as an option (SURVEY.md §7 stage 4).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def l1(pred: jnp.ndarray, target: jnp.ndarray, weight=None) -> jnp.ndarray:
    """``nn.L1Loss`` (mean reduction).

    ``weight`` is an optional per-example ``(B,)`` vector (0/1 validity mask
    from the drop-free batch padder, parallel.mesh.shard_batch): the mean then
    runs over real examples only, so a padded batch reproduces the unpadded
    loss exactly.
    """
    diff = jnp.abs(pred - target)
    if weight is None:
        return jnp.mean(diff)
    w = weight.reshape(weight.shape + (1,) * (diff.ndim - 1))
    per_example = math.prod(diff.shape[1:])
    return jnp.sum(w * diff) / (jnp.sum(weight) * per_example)


def masked_l1_pair(mask, mix, voc, weight=None):
    """L1(mask*mix, voc) + L1((1-mask)*mix, clamp(mix-voc, 0))
    (reference train.py:274-283). Returns (total, pred_vocal)."""
    pred_vocal = mask * mix
    pred_accomp = (1.0 - mask) * mix
    target_accomp = jnp.clip(mix - voc, 0.0, None)
    total = (l1(pred_vocal, voc, weight)
             + l1(pred_accomp, target_accomp, weight))
    return total, pred_vocal


def weighted_l1(target_vocal, target_mix, mask, reduction: str = "mean"):
    """Fixed version of reference WeightedL1Loss (model.py:15-40): each L1
    term elementwise-weighted by its per-row summed L1 difference."""
    pred_vocal = mask * target_mix
    pred_accomp = (1.0 - mask) * target_mix
    target_accomp = jnp.clip(target_mix - target_vocal, 0.0, None)

    def weighted(pred, target):
        diff = jnp.abs(pred - target)
        weight = jnp.sum(diff, axis=-1, keepdims=True)
        return diff * weight

    loss = weighted(pred_vocal, target_vocal) + weighted(pred_accomp, target_accomp)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
