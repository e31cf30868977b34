"""MC-dropout selector — modes random / variance / variance_representative.

Parity: reference active_selection/mc_dropout.py. The 20-stochastic-forward
vote-entropy sweep (mc_dropout.py:30-80) runs as one jitted lax.scan per
batch (selection/kernels.py); image ranking keeps the reference's stable
descending sort on mean entropy (mc_dropout.py:195); the region pipeline is
shared (region_pipeline.py).
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.selection import kernels
from deep_active_semantic_segmentation_tpu.selection.base import (
    ActiveSelectionBase, ModelBundle, collect_scores, rank_descending)
from deep_active_semantic_segmentation_tpu.selection.region_pipeline import (
    create_region_maps_from_scorer)


class ActiveSelectionMCDropout(ActiveSelectionBase):
    def __init__(self, dataset_num_classes, dataset_store, crop_size,
                 dataloader_batch_size, mesh=None, **kw):
        super().__init__(dataset_store, crop_size, dataloader_batch_size,
                         mesh=mesh, **kw)
        self.dataset_num_classes = dataset_num_classes

    def get_random_uncertainity(self, images, selection_count):
        """Random baseline (mc_dropout.py:23-28): python random scores +
        the same stable sort as every other ranker."""
        scores = [random.random() for _ in range(len(images))]
        return rank_descending(scores, images, selection_count)

    def _entropy_scorer(self, bundle: ModelBundle, rng):
        holder = {"i": 0}

        def score_batch(batch):
            key = jax.random.fold_in(rng, holder["i"])
            holder["i"] += 1
            if self.pool_mesh is not None:
                return kernels.mc_vote_entropy_maps_sharded(
                    self.pool_mesh, bundle.model, bundle.variables,
                    batch["image"], batch["label"], key,
                    self.dataset_num_classes, constants.MC_STEPS, "dropout",
                    fused_upsample=True,
                    compute_dtype=self.mc_dtype(), labels_packed=True)
            return kernels.mc_vote_entropy_maps(
                bundle.model, bundle.variables,
                jnp.asarray(batch["image"]), jnp.asarray(batch["label"]),
                key, self.dataset_num_classes, constants.MC_STEPS, "dropout",
                fused_upsample=True,
                compute_dtype=self.mc_dtype(), labels_packed=True)
        return score_batch

    def get_vote_entropy_for_images(self, bundle: ModelBundle, images,
                                    selection_count, seed: int = 0):
        """mc_dropout.py:173-196: rank pool by mean vote entropy."""
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=self.dataset_num_classes)
        scorer = self._entropy_scorer(bundle, jax.random.PRNGKey(seed))
        scores = collect_scores(
            loader, lambda batch: jnp.mean(scorer(batch), axis=(1, 2)))
        return rank_descending(scores, list(images), selection_count)

    def create_region_maps(self, bundle: ModelBundle, images,
                           existing_regions, region_size, selection_size,
                           seed: int = 0) -> Tuple[Dict, int]:
        """mc_dropout.py:123-171."""
        base_size = 512 if self.crop_size == -1 else self.crop_size
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=self.dataset_num_classes)
        scorer = self._entropy_scorer(bundle, jax.random.PRNGKey(seed))
        return create_region_maps_from_scorer(
            scorer, loader, list(images), existing_regions, region_size,
            selection_size, base_size)
