"""Mesh construction and sharding helpers.

Replaces torch.nn.DataParallel (reference active_train.py:83-85): a 1-D
``data`` mesh over the visible devices; global batches are sharded along
their leading axis, parameters/optimizer state are replicated. Works
identically on one chip (trivial mesh), a v5e slice, or the 8-device
virtual CPU mesh the tests force.

An optional ``spatial`` axis is supported for sharding full-resolution
pool scoring along image height (the reference's analog of long-context
splitting is spatial, SURVEY.md section 5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, spatial: int = 1) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % spatial == 0, (n, spatial)
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put array leaves with the batch sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


# -- multi-host input sharding ----------------------------------------------
# On a multi-host slice each process loads only ITS slice of the global
# batch (SURVEY.md section 2.2: "per-host sharded input pipeline"); the
# global jax.Array is assembled from the per-process shards without any
# cross-host gather of pixels.

def process_batch_slice(global_batch_size: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None):
    """(start, size) of this host's contiguous slice of a global batch.

    The global batch must divide evenly over processes — the pools already
    pad datasets to batch multiples (data/pools.py), so enforcing
    divisibility here catches misconfiguration instead of silently
    dropping samples.
    """
    idx = jax.process_index() if process_index is None else process_index
    count = jax.process_count() if process_count is None else process_count
    assert global_batch_size % count == 0, (global_batch_size, count)
    per = global_batch_size // count
    return idx * per, per


def shard_batch_from_local(mesh: Mesh, local_batch: dict) -> dict:
    """Assemble globally-sharded batch arrays from per-process local data.

    ``local_batch`` holds only this process's slice (leading axis =
    global_batch / process_count). With one process this is equivalent to
    ``shard_batch``. Scalars (e.g. ``nvalid``) pass through untouched —
    they are per-process bookkeeping.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in local_batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        else:
            out[k] = v
    return out
