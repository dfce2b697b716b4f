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


def global_batch_from_local(mesh: Mesh, batch: Dict[str, np.ndarray],
                            axis_name: str = "data"):
    """Assemble a globally-sharded batch from per-host local arrays.

    Each host passes its local (B_local, ...) arrays; the result is a global
    (B_local * process_count, ...) jax.Array sharded over the mesh's data
    axis.  Uses ``jax.make_array_from_process_local_data``; on one process
    this is equivalent to a sharded device_put.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
