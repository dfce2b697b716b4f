"""Whole-epoch-in-one-jit training: ``lax.scan`` over HBM-resident crops.

With the dataset device-resident (``data/device_data.py``) nothing per-step
needs the host at all — so don't go back to it: this compiles ONE XLA
program that scans the optimisation step over the epoch's crop indices
(gather + forward + loss + backward + Adam per iteration) and returns the
final state plus the per-step loss vector.  Per EPOCH: one host->device
transfer (two small index matrices) and one device->host fetch (the loss
vector).  Eliminates the per-step dispatch/RPC overhead that the
device-resident pipeline still paid (~5 ms/step measured on the tunnelled
v5e — 24% of the 21 ms effective step time).

Semantics match the per-step loop exactly: the scan body IS the same
``make_step_fn`` body the jitted step wraps, the RNG carry replays the
loop's ``jax.random.split`` sequence, and the gather is the same
``gather_crops``.  (Bit-exactness is NOT guaranteed across the two modes —
XLA may fuse the scan body differently than the standalone step program —
so equivalence tests use float tolerances; the reference semantics
(train.py:239-311) are preserved either way.)

The ragged tail batch (when batch_size doesn't divide the epoch) runs
through the regular per-step program after the scan — same RNG order.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import lax
import optax

from svs_tpu.data.device_data import gather_crops
from svs_tpu.train.step import make_step_fn
from svs_tpu.utils.config import SVSConfig


def make_epoch_scan(cfg: Optional[SVSConfig] = None,
                    optimizer: Optional[optax.GradientTransformation] = None):
    """Returns jitted ``epoch(state, planes, songs, starts, rng) ->
    (state, rng, losses)``.

    songs/starts: (n_steps, B) int32 — the stacked epoch index stream
    (``device_data.epoch_index_arrays``).  ``rng`` is carried through the
    same per-step ``jax.random.split`` sequence as the host loop, so
    dropout draws are identical; the returned key continues the stream for
    the tail batch / next epoch.  ``losses`` is the (n_steps,) per-step
    total-loss vector (the loop's text-log contract needs per-step values
    for the epoch mean, reference train.py:303-313).
    """
    cfg = cfg or SVSConfig()
    step_fn = make_step_fn(cfg, optimizer)
    input_len = cfg.input_len

    def epoch(state, planes, songs, starts, rng):
        def body(carry, xs):
            state, rng = carry
            s, st = xs
            rng, sub = jax.random.split(rng)
            batch = gather_crops(planes, s, st, input_len)
            state, aux = step_fn(state, batch, sub)
            return (state, rng), aux["total"]

        (state, rng), losses = lax.scan(body, (state, rng), (songs, starts))
        return state, rng, losses

    return jax.jit(epoch, donate_argnums=(0,))
