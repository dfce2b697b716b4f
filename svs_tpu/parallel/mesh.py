"""Device mesh + sharding helpers.

The reference has no distributed support at all (SURVEY.md §2.3: single-device
pick at train.py:19, no torch.distributed anywhere).  These are first-class
new components: a 1-D ``data`` mesh for batch-parallel training over ICI and
a ``time`` axis view for segment-parallel whole-song inference.  XLA inserts
the collectives (gradient psum, gather) from sharding annotations — there is
no hand-written NCCL analogue to port.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} present"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (the batch / segment axis) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch dict onto the mesh, batch-dim sharded.

    Pads the batch up to a multiple of the mesh size with ZERO items (XLA
    requires equal shards) and attaches a per-example ``"weight"`` 0/1
    validity vector.  The train/eval steps exclude zero-weight examples from
    every reduction (loss means, Frobenius norms, BatchNorm batch stats), so
    a remainder batch produces EXACTLY the loss, gradients and BN statistics
    of the unpadded batch — drop-free and bias-free.
    """
    # pad to the SHARDED axis's size: on a 1-D mesh that is every device;
    # on a 2-D (data, model) mesh only the data dimension splits the batch
    n = int(mesh.shape[axis_name])
    sharding = batch_sharded(mesh, axis_name)

    b = next(iter(batch.values())).shape[0]
    pad = (n - b % n) % n
    weight = np.ones(b + pad, np.float32)
    weight[b:] = 0.0

    def put(x):
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return jax.device_put(x, sharding)

    out = {k: put(np.asarray(v)) for k, v in batch.items()}
    out["weight"] = jax.device_put(weight, sharding)
    return out
