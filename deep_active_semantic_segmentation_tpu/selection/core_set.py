"""Core-set selector (k-center greedy over decoder features).

Parity: reference active_selection/core_set.py. Feature extraction keeps
the reference's pooling geometry (64x64/stride-32 for deeplab,
32x32/stride-16 for enet, core_set.py:44-56); the greedy loop runs fully on
device (ops/distance.kcenter_greedy) instead of sklearn+numpy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu.ops.distance import kcenter_greedy
from deep_active_semantic_segmentation_tpu.selection import kernels
from deep_active_semantic_segmentation_tpu.selection.base import (
    ActiveSelectionBase, ModelBundle)

POOLING = {"deeplab": (64, 32), "enet": (32, 16)}


class ActiveSelectionCoreSet(ActiveSelectionBase):
    def extract_features(self, bundle: ModelBundle, images) -> np.ndarray:
        kernel, stride = POOLING[bundle.model_name]
        loader = self._paths_loader(images, include_labels=False)
        chunks = []
        with self.precision_scope():
            for batch in loader:
                feats = kernels.pooled_features(
                    bundle.model, bundle.variables, jnp.asarray(batch["image"]),
                    kernel, stride)
                chunks.append(np.asarray(feats)[: batch["nvalid"]])
        return np.concatenate(chunks, axis=0)

    def get_k_center_greedy_selections(self, selection_size,
                                       bundle: ModelBundle,
                                       candidate_image_batch,
                                       already_selected_image_batch):
        """core_set.py:40-69: features over selected+candidates, k-center
        greedy seeded by the selected set."""
        combined = list(already_selected_image_batch) + list(candidate_image_batch)
        features = self.extract_features(bundle, combined)
        seed_mask = np.zeros(len(combined), bool)
        seed_mask[: len(already_selected_image_batch)] = True
        picked = kcenter_greedy(jnp.asarray(features), jnp.asarray(seed_mask),
                                int(selection_size))
        return [combined[i] for i in np.asarray(picked)]
