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

A plain-DP mesh composes (``make_epoch_scan(mesh=...)``): the scan body
constrains each gathered batch batch-sharded, so GSPMD partitions gather +
step across the devices while the epoch still costs one dispatch and one
loss fetch (equivalence pinned in tests/test_epoch_scan.py).
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
                    optimizer: Optional[optax.GradientTransformation] = None,
                    mesh=None, axis_name: str = "data",
                    augment: bool = False):
    """Returns jitted ``epoch(state, planes, songs, starts, rng) ->
    (state, rng, losses)``.

    ``augment``: the remix-augmentation variant — the epoch function takes
    three extra ``(n_steps, B)`` stacked vectors (``perm, g_voc, g_acc``
    from ``Augmenter.epoch_vectors``) scanned alongside the crop indices,
    and each in-scan batch goes through ``apply_remix`` between the gather
    and the step.  The host still pays ONE dispatch per epoch; randomness
    stays host-drawn (the program is RNG-free, as in the per-step path).

    songs/starts: (n_steps, B) int32 — the stacked epoch index stream
    (``device_data.epoch_index_arrays``).  ``rng`` is carried through the
    same per-step ``jax.random.split`` sequence as the host loop, so
    dropout draws are identical; the returned key continues the stream for
    the tail batch / next epoch.  ``losses`` is the (n_steps,) per-step
    total-loss vector (the loop's text-log contract needs per-step values
    for the epoch mean, reference train.py:303-313).

    ``mesh``: DP variant — state replicated, planes replicated, and every
    scanned batch constrained batch-sharded on ``axis_name``
    (``with_sharding_constraint``), so GSPMD partitions the in-scan gather
    AND the step across the mesh: the same program data-parallel, still
    with one host round-trip per epoch.  Batch rows pad INSIDE the program
    to a device-count multiple with the 0/1 weight vector the step's
    reductions (loss means, norms, sync-BN stats) already honour —
    weight-zeroed rows are exactly the host distributor's zero rows, so
    any batch size runs.  DP layouts only (the ZeRO/FSDP/TP state
    shardings differ from the replicated in_shardings used here; the
    per-step path covers those).
    """
    cfg = cfg or SVSConfig()
    step_fn = make_step_fn(cfg, optimizer)
    input_len = cfg.input_len

    if augment:
        from svs_tpu.data.augment import apply_remix

    if mesh is None:
        def epoch(state, planes, songs, starts, rng, *aug):
            def body(carry, xs):
                state, rng = carry
                s, st = xs[:2]
                rng, sub = jax.random.split(rng)
                batch = gather_crops(planes, s, st, input_len)
                if augment:
                    batch = apply_remix(batch, *xs[2:])
                state, aux = step_fn(state, batch, sub)
                return (state, rng), aux["total"]

            (state, rng), losses = lax.scan(body, (state, rng),
                                            (songs, starts) + aug)
            return state, rng, losses

        return jax.jit(epoch, donate_argnums=(0,))

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svs_tpu.data.device_data import _gather_weighted

    n_dev = int(mesh.shape[axis_name])
    bsh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def epoch(state, planes, songs, starts, rng, *aug):
        b = songs.shape[1]
        padded = -(-b // n_dev) * n_dev
        weight = jnp.concatenate([jnp.ones(b, jnp.float32),
                                  jnp.zeros(padded - b, jnp.float32)])

        def body(carry, xs):
            state, rng = carry
            s, st = xs[:2]
            rng, sub = jax.random.split(rng)
            # pad indices with (song 0, start 0): the weight multiply in
            # the gather zeroes those rows exactly (device_data policy)
            s = jnp.pad(s, (0, padded - b))
            st = jnp.pad(st, (0, padded - b))
            batch = _gather_weighted(planes, s, st, weight,
                                     input_len=input_len)
            batch = jax.lax.with_sharding_constraint(
                batch, {k: bsh for k in batch})
            if augment:
                # pad rows get identity perm + unit gains, so they stay
                # BITWISE zero through apply_remix (augment.py invariant)
                perm = jnp.concatenate([xs[2],
                                        jnp.arange(b, padded, dtype=jnp.int32)])
                ones = jnp.ones(padded - b, jnp.float32)
                batch = apply_remix(batch, perm,
                                    jnp.concatenate([xs[3], ones]),
                                    jnp.concatenate([xs[4], ones]))
            state, aux = step_fn(state, batch, sub)
            return (state, rng), aux["total"]

        (state, rng), losses = lax.scan(body, (state, rng),
                                        (songs, starts) + aug)
        return state, rng, losses

    n_in = 8 if augment else 5
    return jax.jit(epoch, donate_argnums=(0,),
                   in_shardings=(rep,) * n_in,
                   out_shardings=(rep, rep, rep))
