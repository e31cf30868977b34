"""CEAL selector — confidence / margin / entropy / fusion / weak labels.

Parity: reference active_selection/ceal.py. Every scorer is one
deterministic jitted forward per batch with masked per-pixel maps reduced
on device (ceal.py:19-126); fusion is the shuffled union (ceal.py:133-140);
weak labels return {path: masked argmax prediction} below a decaying
entropy threshold (ceal.py:142-166).
"""

from __future__ import annotations

import random
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu.selection import kernels
from deep_active_semantic_segmentation_tpu.selection.base import (
    ActiveSelectionBase, ModelBundle, collect_scores, rank_ascending,
    rank_descending)


class ActiveSelectionCEAL(ActiveSelectionBase):
    def __init__(self, dataset_num_classes, dataset_store, crop_size,
                 dataloader_batch_size, mesh=None, **kw):
        super().__init__(dataset_store, crop_size, dataloader_batch_size,
                         mesh=mesh, **kw)
        self.dataset_num_classes = dataset_num_classes

    def _score(self, bundle: ModelBundle, images, mode: str) -> List[float]:
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=self.dataset_num_classes)
        with self.precision_scope():
            return collect_scores(
                loader,
                lambda batch: kernels.softmax_score_per_image(
                    bundle.model, bundle.variables,
                    jnp.asarray(batch["image"]), jnp.asarray(batch["label"]),
                    self.dataset_num_classes, mode, labels_packed=True))

    def get_least_confident_samples(self, bundle, images, selection_count):
        return rank_ascending(self._score(bundle, images, "confidence"),
                              list(images), selection_count)

    def get_least_margin_samples(self, bundle, images, selection_count):
        return rank_ascending(self._score(bundle, images, "margin"),
                              list(images), selection_count)

    def _get_entropies(self, bundle, images) -> List[float]:
        return self._score(bundle, images, "entropy")

    def get_maximum_entropy_samples(self, bundle, images, selection_count):
        entropies = self._get_entropies(bundle, images)
        return (rank_descending(entropies, list(images), selection_count),
                entropies)

    def get_fusion_of_confidence_margin_entropy_samples(
            self, bundle, images, selection_count):
        samples1 = self.get_least_confident_samples(bundle, images,
                                                    selection_count)
        samples2 = self.get_least_margin_samples(bundle, images,
                                                 selection_count)
        samples3 = self.get_maximum_entropy_samples(bundle, images,
                                                    selection_count)[0]
        samples = list(set(samples1 + samples2 + samples3))
        random.shuffle(samples)
        return samples[:selection_count]

    def get_weakly_labeled_data(self, bundle, images, threshold,
                                entropies=None) -> Dict:
        if not entropies:
            entropies = self._get_entropies(bundle, images)
        selected_images = [img for img, e in zip(images, entropies)
                           if e < threshold]
        loader = self._paths_loader(selected_images, include_labels=True,
                                    labels_as_mask=self.dataset_num_classes)
        weak_labels = []
        with self.precision_scope():
            for batch in loader:
                preds = kernels.weak_label_predictions(
                    bundle.model, bundle.variables,
                    jnp.asarray(batch["image"]), jnp.asarray(batch["label"]),
                    self.dataset_num_classes, labels_packed=True)
                weak_labels.extend(np.asarray(preds)[: batch["nvalid"]])
        return dict(zip(selected_images, weak_labels))
