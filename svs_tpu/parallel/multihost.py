"""Multi-host (DCN) input pipeline helpers.

On a multi-host pod slice, each host reads its own shard of songs from local
disk and contributes its slice of the global batch; DCN never carries
activations, only the input pipeline (SURVEY.md §5 'distributed communication
backend').  Single-process meshes (including the virtual CPU mesh) degrade to
a plain device_put, so the same training loop runs everywhere.
"""

from __future__ import annotations

from typing import Dict, List

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
