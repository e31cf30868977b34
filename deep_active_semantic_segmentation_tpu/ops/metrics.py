"""Segmentation metrics.

Parity target: reference utils/metrics.py:6-49 (numpy confusion-matrix
Evaluator). Here the confusion matrix is accumulated *on device* inside the
jitted eval step (one ``jnp.bincount`` per batch) and fetched to the host a
single time per epoch — removing the reference's per-batch GPU->CPU transfer
(active_train.py:159-163).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(gt: jnp.ndarray, pred: jnp.ndarray, num_class: int) -> jnp.ndarray:
    """Device-side confusion matrix (reference metrics.py:37-42).

    gt / pred: integer arrays of equal shape; pixels with gt outside
    [0, num_class) are ignored. Jit-safe (static num_class).
    """
    gt = gt.astype(jnp.int32)
    pred = pred.astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_class)
    # One-hot(gt)^T @ one-hot(pred) on the MXU instead of
    # jnp.bincount(num_class*gt + pred): the bincount lowers to a serial
    # scatter-add on TPU (measured 24.3 ms of a 33.8 ms DeepLab-513^2
    # eval step on v5e). The matmul is exact: 0/1 operands are exact in
    # bf16 and the f32 accumulator is integral up to 2^24 — far above
    # any per-batch pixel count (8*513^2 ~ 2.1e6).
    classes = jnp.arange(num_class, dtype=jnp.int32)
    gt_onehot = ((gt[..., None] == classes) & valid[..., None])
    pred_onehot = pred[..., None] == classes
    counts = jnp.einsum(
        "nk,nc->kc",
        gt_onehot.reshape(-1, num_class).astype(jnp.bfloat16),
        pred_onehot.reshape(-1, num_class).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    return counts.astype(jnp.float64
        if jax.config.jax_enable_x64 else jnp.float32)


class Evaluator:
    """Streaming evaluator with the reference's metric definitions.

    The matrix lives on device; ``add_batch`` accepts device arrays produced
    inside a jitted step, numpy arrays, or a precomputed batch matrix.
    """

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.reset()

    def reset(self):
        # int32 accumulator: each per-batch matrix is exactly integral
        # (confusion_matrix docstring), but summing whole-val-set counts in
        # f32 would silently round past 2^24 pixels (~500 Cityscapes crops);
        # int32 is exact to 2^31 (~2e9 pixels — above every reference
        # config; shard the eval set beyond that).
        self._mat = jnp.zeros((self.num_class, self.num_class), jnp.int32)

    def add_batch(self, gt_image, pre_image):
        assert gt_image.shape == pre_image.shape
        self._mat = self._mat + confusion_matrix(
            jnp.asarray(gt_image), jnp.asarray(pre_image),
            self.num_class).astype(jnp.int32)

    def add_matrix(self, mat):
        self._mat = self._mat + jnp.asarray(mat).astype(jnp.int32)

    @property
    def confusion(self) -> np.ndarray:
        return np.asarray(self._mat, dtype=np.float64)

    # Metric definitions follow reference metrics.py:13-35 exactly
    # (nan-mean over classes, frequency weighting over present classes).
    def Pixel_Accuracy(self) -> float:
        m = self.confusion
        with np.errstate(divide="ignore", invalid="ignore"):
            return float(np.diag(m).sum() / m.sum())

    def Pixel_Accuracy_Class(self) -> float:
        m = self.confusion
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.divide(np.diag(m), m.sum(axis=1))
        return float(np.nanmean(acc))

    def Mean_Intersection_over_Union(self) -> float:
        m = self.confusion
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.divide(np.diag(m), m.sum(axis=1) + m.sum(axis=0) - np.diag(m))
        return float(np.nanmean(iou))

    def Frequency_Weighted_Intersection_over_Union(self) -> float:
        m = self.confusion
        with np.errstate(divide="ignore", invalid="ignore"):
            freq = m.sum(axis=1) / m.sum()
            iou = np.divide(np.diag(m), m.sum(axis=1) + m.sum(axis=0) - np.diag(m))
        return float((freq[freq > 0] * iou[freq > 0]).sum())
