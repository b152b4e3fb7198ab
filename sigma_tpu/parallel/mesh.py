"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP runtime
(`/root/reference/engine/engine.py:49-61`): a `jax.sharding.Mesh` with a
`data` axis; batches are sharded along it, parameters replicated, and XLA
inserts the gradient all-reduce over ICI — no explicit process groups.
Multi-host runs call `jax.distributed.initialize()` once and use the same
code (devices attach automatically, input is sharded per process).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    else:
        # an explicit shape may request fewer devices than are visible
        # (e.g. a single-device mesh on the 8-device test backend)
        n = int(np.prod(tuple(shape)))
        if n > len(devices):
            raise ValueError(f"mesh {tuple(shape)} needs {n} devices, "
                             f"have {len(devices)}")
        devices = devices[:n]
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Assemble the (global) device batch from this process's host batch.

    Single-process: device_put with the batch axis sharded over `data`.
    Multi-process: each process's loader holds only its (B/P, ...) slice
    of the global batch (loader.py shards by `process_index`), so the
    global array is assembled with `make_array_from_process_local_data` —
    a bare device_put against a global-mesh sharding would wrongly treat
    the local slice as the full global value. Parity: the reference's
    per-rank batch = global/world_size (dataloader.py:77-80).
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, s) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(s, np.asarray(v))
        for k, v in batch.items()
    }


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
