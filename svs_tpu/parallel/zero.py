"""ZeRO-1 / FSDP: training state sharded over the data axis (GSPMD-derived).

SURVEY.md §2.3 names ZeRO/FSDP among the scale-out mechanisms the
reference (single-device, reference train.py:19) has no analogue for; this
is the TPU-native rendering of stage 1: Adam's moments — 2x the param
bytes, the largest replicated tensor block in a DP job — shard across the
``data`` axis while params and BN state stay replicated.  No hand-written
reduce-scatter/all-gather: the moment leaves get sharding annotations and
the XLA SPMD partitioner derives the dataflow (each chip updates its slice
of the moments, the param update all-gathers once per step) — the same
"annotate, let XLA insert collectives" recipe as ``parallel/tp.py``.

Sharding rule per leaf: the channel-targeted rule shared with
``parallel/tp.py`` (``tp.leaf_spec``): HWIO kernels shard O when divisible
else I — never the 5x5 spatial dims — per-channel vectors shard dim 0,
scalars and non-divisible leaves replicate.  Two layouts:

- **ZeRO-1** (default): only the moments shard; params/BN replicated —
  the gradient allreduce stays, the Adam update runs on each chip's
  moment slice, the param update all-gathers once per step.
- **FSDP** (``fsdp=True``, the ZeRO-3 analogue): params and BN shard by
  the same rule — per-chip state bytes drop ~axis-size-fold, and XLA
  inserts the per-layer param all-gathers where the convs need full
  kernels (gather-on-use, the FSDP dataflow, derived not hand-written).

At this model's 9.6M params the HBM win is irrelevant on real chips, so
like TP these exist for scaled-up variants and to make the memory-scaling
mechanisms first-class.  Semantics are identical to plain DP — pinned
against the single-device step in tests/test_zero.py.

Multi-host meshes work too: the input side is the same global-batch
distributor as plain DP (the batch sharding is identical), resume stays
broadcast-then-shard for free (``fit`` loads + ``multihost.sync_resume``s
the HOST state before :func:`shard_state` places it), and the
checkpoint/preemption saves — which need host-addressable values —
go through ``multihost.gather_state``: one collective jitted all-gather
to a fully-replicated layout on every host, then a primary-only write
(tests/test_multiprocess.py::test_two_process_fsdp_fit_matches_dp).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding

from svs_tpu.parallel import mesh as mesh_lib
from svs_tpu.train.step import (TrainState, create_train_state,
                                make_optimizer, make_step_fn)
from svs_tpu.utils.config import SVSConfig


def tree_shardings(state: TrainState, mesh: Mesh, axis_name: str = "data",
                   fsdp: bool = False) -> TrainState:
    """TrainState-shaped tree of NamedShardings for a CONCRETE state (or a
    ``jax.eval_shape`` result).

    ZeRO-1 (default): opt-state moments sharded by the shared channel
    rule (``tp.leaf_spec`` over the ``data`` axis), everything else
    replicated.  ``fsdp=True`` (the ZeRO-3/FSDP analogue): params and BN
    state shard by the same rule too — per-chip state bytes drop
    ~axis-size-fold and XLA inserts the per-layer param all-gathers the
    compute needs.
    """
    from svs_tpu.parallel import tp

    rep = mesh_lib.replicated(mesh)
    n = int(mesh.shape[axis_name])

    def rule(l):
        return NamedSharding(mesh, tp.leaf_spec(l.shape, n, axis_name))

    return TrainState(
        params=jax.tree.map(rule if fsdp else lambda _: rep, state.params),
        bn_state=jax.tree.map(rule if fsdp else lambda _: rep,
                              state.bn_state),
        opt_state=jax.tree.map(rule, state.opt_state),
        step=rep,
    )


def state_shardings(mesh: Mesh, cfg: Optional[SVSConfig] = None,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    axis_name: str = "data", fsdp: bool = False
                    ) -> TrainState:
    """:func:`tree_shardings` from (cfg, optimizer) alone — used where no
    concrete state exists yet (the jit in/out annotations)."""
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    shapes = jax.eval_shape(
        lambda: create_train_state(jax.random.key(0), cfg, optimizer))
    return tree_shardings(shapes, mesh, axis_name, fsdp)


def shard_state(state: TrainState, mesh: Mesh,
                axis_name: str = "data", fsdp: bool = False) -> TrainState:
    """Place a host/replicated TrainState onto the mesh with ZeRO-1 (or,
    with ``fsdp=True``, fully sharded) layout.  Derives the shardings from
    the concrete state — no re-trace of the model init."""
    return jax.tree.map(jax.device_put, state,
                        tree_shardings(state, mesh, axis_name, fsdp))


def make_zero1_train_step(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    axis_name: str = "data",
    fsdp: bool = False,
):
    """Jitted DP ``step(state, batch, rng) -> (state, metrics)`` whose
    optimizer state — and, with ``fsdp=True``, params and BN state too —
    lives sharded across ``axis_name`` (ZeRO stage 1 / stage-3-style FSDP).

    Same step function as every other mode (``make_step_fn``) — only the
    in/out sharding annotations differ, so the Adam math, sync-BN and
    zero-weight remainder semantics are shared, and the updated state stays
    ZeRO-sharded in place (donated buffers).  Feed batches from
    ``mesh.shard_batch`` / the device-resident dataset exactly as for DP.
    """
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    st_sh = state_shardings(mesh, cfg, optimizer, axis_name, fsdp)
    bsh = mesh_lib.batch_sharded(mesh, axis_name)
    rep = mesh_lib.replicated(mesh)

    return jax.jit(
        make_step_fn(cfg, optimizer),
        in_shardings=(st_sh, bsh, rep),
        out_shardings=(st_sh, None),
        donate_argnums=(0,),
    )
