"""Selector base + the model handle selectors score with.

Parity: reference active_selection/base.py:1-6 (store/crop/batch triple).
``ModelBundle`` replaces the reference's mutable DataParallel module: an
immutable (model, params, batch_stats) triple. The flax module config is
hashable, so jitted scoring kernels take it as a static argument and the
jit cache keys on (architecture, batch shape) — one compile per AL run,
reused across rounds.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np


@dataclass
class ModelBundle:
    model: Any                      # flax nn.Module (hashable config)
    params: Any
    batch_stats: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def model_name(self) -> str:
        return getattr(self.model, "model_name", "model")


class ActiveSelectionBase:
    def __init__(self, dataset_store, crop_size, dataloader_batch_size):
        self.store = dataset_store
        self.crop_size = crop_size
        self.dataloader_batch_size = dataloader_batch_size

    def _paths_loader(self, images, include_labels=True):
        from deep_active_semantic_segmentation_tpu.data.loader import (
            PathsLoader, prefetch_to_device)

        loader = PathsLoader(self.store, images, self.crop_size,
                             self.dataloader_batch_size,
                             include_labels=include_labels)

        def put(batch):
            import jax

            out = dict(batch)
            for k in ("image", "label"):
                if k in out:
                    out[k] = jax.device_put(out[k])
            return out

        # double-buffered host->device prefetch: transform + transfer of
        # batch N+1 overlaps the device sweep of batch N (the reference
        # blocks on both, num_workers=0 in every selector loop,
        # mc_dropout.py:131-132)
        return prefetch_to_device(iter(loader), put, depth=2)


def rank_descending(scores, images, selection_count):
    """reference sorted(zip(scores, images), reverse=True)[:k] — stable on
    ties, keeping pool order (python sorted / stable argsort equivalence)."""
    scores = np.asarray(scores, np.float64)
    order = np.argsort(-scores, kind="stable")
    return [images[i] for i in order[:selection_count]]


def rank_ascending(scores, images, selection_count):
    scores = np.asarray(scores, np.float64)
    order = np.argsort(scores, kind="stable")
    return [images[i] for i in order[:selection_count]]
