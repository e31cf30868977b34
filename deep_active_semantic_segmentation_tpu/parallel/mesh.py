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
