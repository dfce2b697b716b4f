"""ZeRO-1: optimizer state sharded over the data axis (GSPMD-derived).

SURVEY.md §2.3 names ZeRO/FSDP among the scale-out mechanisms the
reference (single-device, reference train.py:19) has no analogue for; this
is the TPU-native rendering of stage 1: Adam's moments — 2x the param
bytes, the largest replicated tensor block in a DP job — shard across the
``data`` axis while params and BN state stay replicated.  No hand-written
reduce-scatter/all-gather: the moment leaves get sharding annotations and
the XLA SPMD partitioner derives the dataflow (each chip updates its slice
of the moments, the param update all-gathers once per step) — the same
"annotate, let XLA insert collectives" recipe as ``parallel/tp.py``.

Sharding rule per moment leaf: the FIRST dim divisible by the axis size
shards (conv kernels are HWIO with 5x5 leading dims, so their channel dims
carry the split); scalars and non-divisible leaves replicate.  Params
themselves stay replicated — stage 1 only; at this model's 9.6M params the
HBM win (~2x param bytes / n_chips) is irrelevant on real chips, so like
TP this exists for scaled-up variants and to make the memory-scaling
mechanism first-class.  Semantics are identical to plain DP — pinned
against the single-device step in tests/test_zero.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svs_tpu.parallel import mesh as mesh_lib
from svs_tpu.train.step import (TrainState, create_train_state,
                                make_optimizer, make_step_fn)
from svs_tpu.utils.config import SVSConfig


def _moment_spec(shape, n: int, axis_name: str) -> P:
    """First dim divisible by ``n`` shards; otherwise replicate."""
    if n > 1:
        for d, s in enumerate(shape):
            if s % n == 0 and s >= n:
                return P(*([None] * d + [axis_name]))
    return P()


def state_shardings(mesh: Mesh, cfg: Optional[SVSConfig] = None,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    axis_name: str = "data") -> TrainState:
    """TrainState-shaped tree of NamedShardings: opt-state moments sharded
    by the first-divisible-dim rule, everything else replicated."""
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    shapes = jax.eval_shape(
        lambda: create_train_state(jax.random.key(0), cfg, optimizer))
    rep = mesh_lib.replicated(mesh)
    n = int(mesh.shape[axis_name])
    opt_sh = jax.tree.map(
        lambda l: NamedSharding(mesh, _moment_spec(l.shape, n, axis_name)),
        shapes.opt_state)
    return TrainState(
        params=jax.tree.map(lambda _: rep, shapes.params),
        bn_state=jax.tree.map(lambda _: rep, shapes.bn_state),
        opt_state=opt_sh,
        step=rep,
    )


def shard_state(state: TrainState, mesh: Mesh,
                cfg: Optional[SVSConfig] = None,
                optimizer: Optional[optax.GradientTransformation] = None,
                axis_name: str = "data") -> TrainState:
    """Place a host/replicated TrainState onto the mesh with ZeRO-1 layout."""
    return jax.tree.map(jax.device_put, state,
                        state_shardings(mesh, cfg, optimizer, axis_name))


def make_zero1_train_step(
    mesh: Mesh,
    cfg: Optional[SVSConfig] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    axis_name: str = "data",
):
    """Jitted DP ``step(state, batch, rng) -> (state, metrics)`` whose
    optimizer state lives sharded across ``axis_name`` (ZeRO stage 1).

    Same step function as every other mode (``make_step_fn``) — only the
    in/out sharding annotations differ, so the Adam math, sync-BN and
    zero-weight remainder semantics are shared, and the updated state stays
    ZeRO-sharded in place (donated buffers).  Feed batches from
    ``mesh.shard_batch`` / the device-resident dataset exactly as for DP.
    """
    cfg = cfg or SVSConfig()
    optimizer = optimizer or make_optimizer(cfg)
    st_sh = state_shardings(mesh, cfg, optimizer, axis_name)
    bsh = mesh_lib.batch_sharded(mesh, axis_name)
    rep = mesh_lib.replicated(mesh)

    return jax.jit(
        make_step_fn(cfg, optimizer),
        in_shardings=(st_sh, bsh, rep),
        out_shardings=(st_sh, None),
        donate_argnums=(0,),
    )
