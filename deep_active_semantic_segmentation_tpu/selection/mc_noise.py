"""MC-noise selector — modes noise_image / noise_feature / noise_variance.

Parity: reference active_selection/mc_noise.py. Vote entropy where the
stochasticity comes from additive input gaussian noise sigma=0.125
(mc_noise.py:21-44), model-internal feature noise via the noisy-features
hook (mc_noise.py:62-84), or the sum of feature-noise and MC-dropout
entropies (mc_noise.py:131-149). All three reuse the jitted vote-entropy
scan (selection/kernels.py) with a different noise_mode; the image score is
sum/ (H*W) — numerically the same mean as mc_dropout's.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.selection import kernels
from deep_active_semantic_segmentation_tpu.selection.base import (
    ActiveSelectionBase, ModelBundle, rank_descending)
from deep_active_semantic_segmentation_tpu.selection.region_pipeline import (
    create_region_maps_from_scorer)


class ActiveSelectionMCNoise(ActiveSelectionBase):
    def __init__(self, num_classes, dataset_store, crop_size,
                 dataloader_batch_size, mesh=None, **kw):
        super().__init__(dataset_store, crop_size, dataloader_batch_size,
                         mesh=mesh, **kw)
        self.dataset_num_classes = num_classes

    def _entropy_maps(self, bundle: ModelBundle, batch, rng, noise_mode: str):
        if self.pool_mesh is not None:
            return kernels.mc_vote_entropy_maps_sharded(
                self.pool_mesh, bundle.model, bundle.variables,
                batch["image"], batch["label"], rng,
                self.dataset_num_classes, constants.MC_STEPS, noise_mode,
                fused_upsample=True,
                compute_dtype=self.mc_dtype(), labels_packed=True)
        return kernels.mc_vote_entropy_maps(
            bundle.model, bundle.variables, jnp.asarray(batch["image"]),
            jnp.asarray(batch["label"]), rng, self.dataset_num_classes,
            constants.MC_STEPS, noise_mode, fused_upsample=True,
            compute_dtype=self.mc_dtype(), labels_packed=True)

    def _rank_by_entropy(self, bundle, images, selection_count, seed,
                         noise_mode: str):
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=self.dataset_num_classes)
        rng = jax.random.PRNGKey(seed)
        scores = []
        for i, batch in enumerate(loader):
            maps = self._entropy_maps(bundle, batch, jax.random.fold_in(rng, i),
                                      noise_mode)
            per_image = np.asarray(jnp.mean(maps, axis=(1, 2)))
            scores.extend(per_image[: batch["nvalid"]].tolist())
        return rank_descending(scores, list(images), selection_count)

    def get_vote_entropy_for_images_with_input_noise(
            self, bundle, images, selection_count, seed: int = 0):
        """mc_noise.py:46-60."""
        return self._rank_by_entropy(bundle, images, selection_count, seed,
                                     "input")

    def get_vote_entropy_for_images_with_feature_noise(
            self, bundle, images, selection_count, seed: int = 0):
        """mc_noise.py:116-129."""
        return self._rank_by_entropy(bundle, images, selection_count, seed,
                                     "feature")

    def _combined_scorer(self, bundle: ModelBundle, rng):
        holder = {"i": 0}

        def score_batch(batch):
            k1 = jax.random.fold_in(rng, 2 * holder["i"])
            k2 = jax.random.fold_in(rng, 2 * holder["i"] + 1)
            holder["i"] += 1
            return (self._entropy_maps(bundle, batch, k1, "feature")
                    + self._entropy_maps(bundle, batch, k2, "dropout"))
        return score_batch

    def get_vote_entropy_for_batch_with_noise_and_vote_entropy(
            self, bundle, images, selection_count, seed: int = 0):
        """mc_noise.py:131-149: feature-noise + MC-dropout entropy sum."""
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=self.dataset_num_classes)
        scorer = self._combined_scorer(bundle, jax.random.PRNGKey(seed))
        scores = []
        for batch in loader:
            maps = scorer(batch)
            per_image = np.asarray(jnp.mean(maps, axis=(1, 2)))
            scores.extend(per_image[: batch["nvalid"]].tolist())
        return rank_descending(scores, list(images), selection_count)

    def create_region_maps(self, bundle: ModelBundle, images,
                           existing_regions, region_size, selection_size,
                           seed: int = 0) -> Tuple[Dict, int]:
        """mc_noise.py:151-195 (combined feature-noise + dropout entropy)."""
        base_size = 512 if self.crop_size == -1 else self.crop_size
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=self.dataset_num_classes)
        scorer = self._combined_scorer(bundle, jax.random.PRNGKey(seed))
        return create_region_maps_from_scorer(
            scorer, loader, list(images), existing_regions, region_size,
            selection_size, base_size)
