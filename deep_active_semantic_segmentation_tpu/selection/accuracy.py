"""Accuracy-based selectors (labels oracle + accuracy-predictor family).

Parity: reference active_selection/accuracy.py — oracle misprediction
counts (accuracy.py:18-37), error-head softmax/argmax scoring
(accuracy.py:39-71), input-gradient vulnerability (accuracy.py:73-96, the
only selector that runs backward — here one jax.grad through the error
head), unsure 4p-4p^2 scoring (accuracy.py:98-117), error-map region
pipeline (accuracy.py:131-183), and the cross-job selections.txt monitor
(accuracy.py:185-197).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu.selection import kernels
from deep_active_semantic_segmentation_tpu.selection.base import (
    ActiveSelectionBase, ModelBundle, collect_scores, rank_descending)
from deep_active_semantic_segmentation_tpu.selection.region_pipeline import (
    create_region_maps_from_scorer)


class ActiveSelectionAccuracy(ActiveSelectionBase):
    def __init__(self, num_classes, dataset_store, crop_size,
                 dataloader_batch_size, mesh=None, **kw):
        super().__init__(dataset_store, crop_size, dataloader_batch_size,
                         mesh=mesh, **kw)
        self.num_classes = num_classes

    def _collect(self, images, fn, labels_as_mask=None):
        # labels_as_mask: every scorer here except the ground-truth oracle
        # reads labels only through valid_mask -> 1-bit packed wire
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=labels_as_mask)
        with self.precision_scope():
            return collect_scores(
                loader, lambda batch: fn(jnp.asarray(batch["image"]),
                                         jnp.asarray(batch["label"])))

    def get_least_accurate_sample_using_labels(self, bundle: ModelBundle,
                                               images, selection_count):
        scores = self._collect(images, lambda im, lb: kernels.misprediction_counts(
            bundle.model, bundle.variables, im, lb, self.num_classes))
        return rank_descending(scores, list(images), selection_count)

    def get_least_accurate_samples(self, bundle: ModelBundle, images,
                                   selection_count, mode="softmax"):
        if mode not in ("softmax", "argmax"):
            raise NotImplementedError(mode)
        scores = self._collect(
            images, lambda im, lb: kernels.error_head_scores(
                bundle.model, bundle.variables, im, lb, self.num_classes,
                mode, labels_packed=True),
            labels_as_mask=self.num_classes)
        return rank_descending(scores, list(images), selection_count)

    def get_adversarially_vulnarable_samples(self, bundle: ModelBundle,
                                             images, selection_count):
        scores = self._collect(
            images, lambda im, lb: kernels.input_gradient_norms(
                bundle.model, bundle.variables, im, lb, self.num_classes,
                labels_packed=True),
            labels_as_mask=self.num_classes)
        return rank_descending(scores, list(images), selection_count)

    def get_unsure_samples(self, bundle: ModelBundle, images, selection_count):
        scores = self._collect(
            images, lambda im, lb: kernels.error_head_scores(
                bundle.model, bundle.variables, im, lb, self.num_classes,
                "unsure", labels_packed=True),
            labels_as_mask=self.num_classes)
        return rank_descending(scores, list(images), selection_count)

    def get_least_accurate_region_maps(self, bundle: ModelBundle, images,
                                       existing_regions, region_size,
                                       selection_size) -> Tuple[Dict, int]:
        base_size = 512 if self.crop_size == -1 else self.crop_size
        loader = self._paths_loader(images, include_labels=True,
                                    labels_as_mask=self.num_classes)

        def score_batch(batch):
            with self.precision_scope():
                return kernels.error_head_maps(
                    bundle.model, bundle.variables, jnp.asarray(batch["image"]),
                    jnp.asarray(batch["label"]), self.num_classes,
                    labels_packed=True)

        return create_region_maps_from_scorer(
            score_batch, loader, list(images), existing_regions, region_size,
            selection_size, base_size)

    def wait_for_selected_samples(self, location_to_monitor, images,
                                  poll_seconds: float = 5.0,
                                  timeout: float = None):
        """accuracy.py:185-197 with an optional timeout instead of the
        reference's unbounded hang when the producer dies."""
        waited = 0.0
        while not os.path.exists(location_to_monitor):
            time.sleep(poll_seconds)
            waited += poll_seconds
            if timeout is not None and waited >= timeout:
                raise TimeoutError(location_to_monitor)
        with open(location_to_monitor, "r") as f:
            paths = [x.strip().encode("ascii") for x in f.readlines()
                     if x.strip()]
        return [x for x in paths if x in images]
