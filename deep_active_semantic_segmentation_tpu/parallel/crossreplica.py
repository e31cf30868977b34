"""Cross-replica batch-norm statistics — the explicit component replacing
the reference's entire models/sync_batchnorm package (497 LoC of
master/slave thread collectives, SURVEY.md section 5.8).

Two TPU-native forms:

1. **pjit path (default)**: under jit with the batch sharded over the
   ``data`` mesh axis, a plain flax BatchNorm already computes GLOBAL batch
   statistics — ``jnp.mean`` over a sharded axis makes XLA insert the
   cross-chip all-reduce. Nothing to do; this is what the models use.
2. **shard_map path**: when a step is written per-device with
   ``shard_map``, means are per-shard, so BatchNorm needs
   ``axis_name='data'`` to psum the statistics. Every model takes a
   ``bn_axis_name`` attribute for this; ``cross_replica_mean`` is the raw
   primitive.

The parity test (tests/test_parallel.py, cross-replica BN case) verifies
the shard_map psum
statistics equal single-device whole-batch statistics on the 8-device CPU
mesh — the equivalence the reference's SyncBN exists to provide
(batchnorm.py:56-111).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_replica_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    return jax.lax.pmean(x, axis_name)


def batch_norm_stats(x: jnp.ndarray, axis_name=None):
    """(mean, var) over batch+spatial dims, psum-reduced across replicas
    when ``axis_name`` is set — the computation SyncBN's master thread
    performs with ReduceAddCoalesced (reference batchnorm.py:56-103)."""
    reduce_dims = tuple(range(x.ndim - 1))
    ssum = jnp.sum(x, axis=reduce_dims)
    sqsum = jnp.sum(x * x, axis=reduce_dims)
    count = jnp.asarray(x.size / x.shape[-1], jnp.float32)
    if axis_name is not None:
        ssum = jax.lax.psum(ssum, axis_name)
        sqsum = jax.lax.psum(sqsum, axis_name)
        count = jax.lax.psum(count, axis_name)
    mean = ssum / count
    var = sqsum / count - mean * mean
    return mean, var
