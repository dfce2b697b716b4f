"""Multi-host (DCN) input pipeline helpers.

On a multi-host pod slice, each host reads its own shard of songs from local
disk and contributes its slice of the global batch; DCN never carries
activations, only the input pipeline (SURVEY.md §5 'distributed communication
backend').  Single-process meshes (including the virtual CPU mesh) degrade to
a plain device_put, so the same training loop runs everywhere.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_shard(items: List, process_index: int | None = None,
                  process_count: int | None = None) -> List:
    """Deterministic round-robin split of a work list (e.g. song file names)
    across hosts — each host's PatchDataset sees only its shard."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return items[pi::pc]


def local_quota(mesh: Mesh, axis_name: str = "data") -> int:
    """This process's device count along the mesh's data axis."""
    return int(mesh.local_mesh.shape[axis_name])


def global_batch_from_local(mesh: Mesh, batch: Dict[str, np.ndarray],
                            axis_name: str = "data",
                            pad_to: int | None = None):
    """Assemble a globally-sharded batch from per-host local arrays.

    Each host passes its local (B_local, ...) arrays; the result is a global
    (B_padded * process_count, ...) jax.Array sharded over the mesh's data
    axis.  Uses ``jax.make_array_from_process_local_data``; on one process
    this is equivalent to a sharded device_put.

    ``pad_to``: fixed per-host row target (must be a multiple of this host's
    device quota on the data axis, identical on every host).  Local arrays
    are zero-padded up to it and a per-example 0/1 ``weight`` vector is
    attached (extending one already present), so ANY local batch size works
    regardless of device-count divisibility and the padded rows drop out of
    every loss/BN reduction exactly (same drop-free remainder policy as
    ``mesh.shard_batch``).  Without it, local rows must already divide the
    per-host device quota or XLA's sharding check fails.
    """
    batch = {k: np.asarray(v) for k, v in batch.items()}
    if pad_to is not None:
        rows = next(iter(batch.values())).shape[0]
        lq = local_quota(mesh, axis_name)
        if pad_to % lq:
            raise ValueError(f"pad_to={pad_to} not a multiple of this "
                             f"host's data-axis quota {lq}")
        if rows > pad_to:
            raise ValueError(f"local batch rows {rows} exceed pad_to={pad_to}")
        weight = batch.pop("weight",
                           np.ones((rows,), np.float32))
        pad = pad_to - rows
        if pad:
            batch = {k: np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                for k, v in batch.items()}
            weight = np.concatenate([weight, np.zeros((pad,), np.float32)])
        batch["weight"] = weight
    sharding = NamedSharding(mesh, P(axis_name))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def global_batch_from_global(mesh: Mesh, batch: Dict[str, np.ndarray],
                             axis_name: str = "data",
                             pad_rows_to: int | None = None):
    """Distribute a batch that EVERY host holds in full (same values, same
    order) into one globally-sharded jax.Array per key.

    Used by multi-host validation: each host iterates the same global
    validation sequence (redundant host-side IO, exact semantics), so the
    per-batch loss — and the best-checkpoint decision it drives — is
    bit-identical to the single-host run; hosts are in lockstep for free.
    Rows are zero-padded to the data-axis device count with a 0/1 ``weight``
    vector (``mesh.shard_batch`` policy), then distributed with
    ``jax.make_array_from_callback`` so each host supplies exactly its
    addressable shards, independent of device order in the mesh.

    ``pad_rows_to``: fixed global row target (rounded up to the device
    count here) — pass the full batch size so a remainder batch keeps the
    SAME global shape as full batches and the eval program compiles once
    (static-shapes convention; remote compiles cost 20s-10min per
    signature).  Zero-weight padding makes the weighted batch mean equal
    to the unpadded batch's regardless of how far it pads.
    """
    n_dev = int(mesh.shape[axis_name])
    batch = {k: np.asarray(v) for k, v in batch.items()}
    rows = next(iter(batch.values())).shape[0]
    target = max(rows, pad_rows_to or 0)
    padded = -(-target // n_dev) * n_dev
    weight = batch.pop("weight", np.ones((rows,), np.float32))
    if padded != rows:
        batch = {k: np.concatenate(
            [v, np.zeros((padded - rows,) + v.shape[1:], v.dtype)])
            for k, v in batch.items()}
        weight = np.concatenate(
            [weight, np.zeros((padded - rows,), np.float32)])
    batch["weight"] = weight
    sharding = NamedSharding(mesh, P(axis_name))
    return {
        k: jax.make_array_from_callback(v.shape, sharding,
                                        lambda idx, v=v: v[idx])
        for k, v in batch.items()
    }


# --- cross-host coordination (SURVEY.md §5 failure detection/recovery) -----
#
# The reference's recovery story is single-process restart-from-checkpoint
# (reference train.py:216-237).  Generalised to a multi-controller job, two
# silent-desync hazards appear that these helpers close:
#  1. resume state is read per-host from local disk — a host with a missing
#     or stale checkpoint would silently start at a different epoch and hang
#     the job at its next collective (different loop trip counts);
#  2. SIGTERM delivered to a subset of hosts would make those exit mid-epoch
#     while the rest block forever in the next collective.


def any_flag(flag: bool) -> bool:
    """Global OR of a per-host bool — the collectively-coordinated preemption
    check: every host calls this at the same loop point (same call count on
    all hosts!), and ALL of them see True as soon as ANY host was signalled,
    so they save/exit in lockstep instead of skewing.  Single-process: the
    local flag is already the truth."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([bool(flag)], np.int32))
    return bool(np.asarray(flags).any())


def assert_scalar_agreement(value: float, what: str, tol: float = 0.0) -> None:
    """Loud cross-host check that a host-computed scalar (e.g. the validation
    loss driving the best-checkpoint decision) is identical on every host.

    The design guarantees bit-identical values (the eval loss is a global
    collective mean fetched from replicated device state), so a divergence
    means a real bug (non-deterministic reduction, wrong sharding) — fail
    fast here rather than silently desync best-checkpoint decisions."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    vals = np.asarray(multihost_utils.process_allgather(
        np.asarray([value], np.float64))).ravel()
    spread = float(np.max(vals) - np.min(vals))
    if not (spread <= tol) or not np.isfinite(vals).all():
        raise RuntimeError(
            f"cross-host disagreement on {what}: per-host values {vals.tolist()}"
            f" (spread {spread:g} > tol {tol:g}) — hosts would desync")


def _params_checksum(tree: Any) -> float:
    """Cheap order-stable checksum of a pytree of arrays (f64 sum of sums)."""
    return float(sum(float(np.sum(np.asarray(x, np.float64)))
                     for x in jax.tree.leaves(tree)))


def sync_resume(state, start_epoch: int, extras: Dict[str, Any],
                ) -> Tuple[Any, int, Dict[str, Any]]:
    """Make per-host checkpoint resume fail-safe across hosts.

    Every host allgathers (start_epoch, params-checksum).  If all hosts
    agree, resume proceeds as loaded.  If they disagree (a host missing the
    checkpoint file resumed at epoch 0, or read a stale copy):
      - when process 0 holds the newest epoch, its full train state + epoch
        + extras are broadcast to every host (loud warning) — the job
        continues correctly instead of hanging at the next collective;
      - when some OTHER host is ahead of process 0, that's an unfixable
        split-brain from process 0's view (we can only broadcast from 0):
        raise loudly on every host.

    Called before the state is device-replicated (host-local numpy/jax
    arrays), so the broadcast moves each leaf once over DCN.
    """
    if jax.process_count() == 1:
        return state, start_epoch, extras
    from jax.experimental import multihost_utils

    me = np.asarray([float(start_epoch),
                     _params_checksum(state.params)], np.float64)
    all_ = np.asarray(multihost_utils.process_allgather(me))
    epochs, sums = all_[:, 0], all_[:, 1]
    if (epochs == epochs[0]).all() and (sums == sums[0]).all():
        return state, start_epoch, extras

    if epochs.max() > epochs[0]:
        raise RuntimeError(
            "resume desync: process 0 resumed at epoch "
            f"{int(epochs[0])} but another host is ahead "
            f"(per-host epochs {epochs.astype(int).tolist()}); process 0 "
            "cannot repair this — restore its checkpoint and restart")

    print(f"[multihost] resume desync detected (per-host epochs "
          f"{epochs.astype(int).tolist()}, checksums differ) — "
          "broadcasting process 0's train state to all hosts")
    # 1) fixed-size scalar header: epoch, best_val_loss, history length
    hist = [float(x) for x in extras.get("loss_list_total", [])]
    header = multihost_utils.broadcast_one_to_all(np.asarray(
        [float(start_epoch),
         float(extras.get("best_val_loss", 100.0)),
         float(len(hist))], np.float64))
    n_hist = int(header[2])
    # 2) history padded to the broadcast length (shapes must match on all
    #    hosts for broadcast_one_to_all)
    hist_arr = np.zeros((n_hist,), np.float64)
    hist_arr[:min(len(hist), n_hist)] = hist[:n_hist]
    hist_arr = np.asarray(multihost_utils.broadcast_one_to_all(hist_arr))
    # 3) the full train state (identical tree structure/shapes everywhere —
    #    it's the same model; only the values differ)
    state = jax.tree.map(
        np.asarray,
        multihost_utils.broadcast_one_to_all(
            jax.tree.map(lambda x: np.asarray(x), state)))
    extras = dict(extras, best_val_loss=float(header[1]),
                  loss_list_total=[float(x) for x in hist_arr])
    return state, int(header[0]), extras


def _identity(x):
    return x


@functools.lru_cache(maxsize=8)
def _gather_jit(mesh: Mesh):
    """Per-mesh cached jitted identity that reshards its input to fully
    replicated.  Module-level + cached so repeated checkpoint writes reuse
    the SAME pjit callable — a fresh ``jax.jit(lambda ...)`` per save would
    miss the trace cache every time (and remote compiles cost 20s-10min per
    signature on the target rig).  One XLA signature per distinct leaf
    (shape, dtype); a U-Net train state has ~a dozen."""
    return jax.jit(_identity, out_shardings=NamedSharding(mesh, P()))


def gather_state(state: Any, mesh: Mesh) -> Any:
    """Host-replicated numpy copy of a (possibly cross-host partitioned)
    train state — the save-side companion of the ZeRO/FSDP layouts
    (``parallel/zero.py``), where opt-state/params shards live on devices
    this process cannot address.

    LEAF-WISE jitted identities re-shard to fully-replicated (XLA derives
    the all-gathers, riding ICI/DCN as the mesh dictates), then each host
    copies its local full replica.  Leaf-wise — not one whole-tree program —
    so the device-memory spike is one replicated LEAF (~MBs), not the whole
    replicated state: FSDP exists precisely for models whose full state
    exceeds per-chip HBM, and a whole-tree gather would OOM at save time on
    exactly those.  COLLECTIVE: every process must call it at the same
    program point with the same tree structure (leaf order fixes the
    collective order); the training loop does so right before each
    primary-gated checkpoint write (the save sites are reached in lockstep —
    epoch counts, ``saved_latest`` and the best-val decision are identical
    on every host, and preemption stops are coordinated).

    Single-process (or already-replicated) states pass through the same
    path unchanged semantically — it is still a correct gather.
    """
    gather = _gather_jit(mesh)
    return jax.tree.map(
        lambda x: np.asarray(gather(x).addressable_data(0)), state)
