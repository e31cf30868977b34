"""Active-selection engine: batched on-device pool sweeps.

Parity: reference active_selection/ — same factory surface
(active_selection/__init__.py:9-25), same 13 selection modes, same method
names on the selector classes. Scoring runs as jitted whole-batch kernels
that keep per-pixel maps on device and emit only per-image scalars or
region boxes (the reference pulls a map per image to the host,
mc_dropout.py:189).
"""

from deep_active_semantic_segmentation_tpu.selection.accuracy import (
    ActiveSelectionAccuracy)
from deep_active_semantic_segmentation_tpu.selection.base import ModelBundle
from deep_active_semantic_segmentation_tpu.selection.ceal import (
    ActiveSelectionCEAL)
from deep_active_semantic_segmentation_tpu.selection.core_set import (
    ActiveSelectionCoreSet)
from deep_active_semantic_segmentation_tpu.selection.max_subset import (
    ActiveSelectionMaxSubset)
from deep_active_semantic_segmentation_tpu.selection.mc_dropout import (
    ActiveSelectionMCDropout)
from deep_active_semantic_segmentation_tpu.selection.mc_noise import (
    ActiveSelectionMCNoise)


def get_active_selection_class(active_selection_method, dataset_num_classes,
                               store, crop_size, dataloader_batch_size,
                               mesh=None, scoring_precision=None,
                               mc_dtype=None):
    """reference active_selection/__init__.py:9-21 (store replaces lmdb env).

    ``mesh``: optional jax.sharding.Mesh — pool-scoring batches shard over
    its flattened device list (selection/base.ActiveSelectionBase).
    ``scoring_precision`` / ``mc_dtype``: per-instance precision policy
    (selection/base.py), so concurrent loops stay independent."""
    m = active_selection_method
    kw = dict(mesh=mesh, scoring_precision=scoring_precision,
              mc_dtype=mc_dtype)
    if m == "coreset":
        return ActiveSelectionCoreSet(store, crop_size, dataloader_batch_size,
                                      **kw)
    if m in ("ceal_confidence", "ceal_margin", "ceal_entropy", "ceal_fusion",
             "ceal_entropy_weakly_labeled"):
        return ActiveSelectionCEAL(dataset_num_classes, store, crop_size,
                                   dataloader_batch_size, **kw)
    if m in ("noise_image", "noise_feature", "noise_variance"):
        return ActiveSelectionMCNoise(dataset_num_classes, store, crop_size,
                                      dataloader_batch_size, **kw)
    if m in ("variance", "variance_representative", "random"):
        return ActiveSelectionMCDropout(dataset_num_classes, store, crop_size,
                                        dataloader_batch_size, **kw)
    if m in ("accuracy_labels", "accuracy_eval"):
        return ActiveSelectionAccuracy(dataset_num_classes, store, crop_size,
                                       dataloader_batch_size, **kw)
    raise NotImplementedError(m)


def get_max_subset_active_selector(store, crop_size, dataloader_batch_size,
                                   mesh=None, scoring_precision=None,
                                   mc_dtype=None):
    return ActiveSelectionMaxSubset(store, crop_size, dataloader_batch_size,
                                    mesh=mesh,
                                    scoring_precision=scoring_precision,
                                    mc_dtype=mc_dtype)
