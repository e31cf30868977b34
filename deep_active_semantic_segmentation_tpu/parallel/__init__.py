"""Parallel training runtime: device mesh, sharding, jitted step functions.

The TPU-native replacement for the reference's DataParallel +
sync_batchnorm stack (SURVEY.md section 5.8): one ``jax.sharding.Mesh``
with a ``data`` axis, batches sharded over it, parameters replicated, and
XLA inserting the gradient/batch-stat collectives over ICI.
"""

from deep_active_semantic_segmentation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicated_sharding, shard_batch)
from deep_active_semantic_segmentation_tpu.parallel.steps import (  # noqa: F401
    TrainState, make_eval_step, make_train_step)
