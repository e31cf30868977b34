"""Segmentation losses.

Numerical parity targets: reference utils/loss.py:5-70.

* ``cross_entropy``: torch ``nn.CrossEntropyLoss(weight, ignore_index=255,
  reduction='mean')`` — a weighted mean over non-ignored pixels — followed by
  the reference's ``batch_average`` quirk of dividing again by the batch size
  (loss.py:39-51).
* ``focal_loss``: computed from the *mean* CE as in loss.py:53-70 (the
  reference exponentiates the averaged log-probability, not per-pixel).
* ``sample_weighted_cross_entropy``: loss.py:22-37 (per-sample weights;
  unused by the reference drivers but part of the public surface).

All functions take NHWC logits and (B, H, W) integer targets with 255 as the
ignore label, and are safe to ``jax.jit`` / differentiate.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = 255


def _per_pixel_nll(logits: jnp.ndarray, target: jnp.ndarray):
    """Per-pixel negative log-likelihood and validity mask.

    Returns (nll, valid) where ``nll`` is zero at ignored pixels.
    """
    target = target.astype(jnp.int32)
    valid = target != IGNORE_INDEX
    safe_target = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # Pick logp[..., target] via a one-hot masked reduction instead of
    # take_along_axis: XLA:TPU lowers the class-axis gather at full
    # resolution to a serial dynamic-gather (measured 37.8 ms of a 67.5 ms
    # DeepLab-513^2 train step on v5e); the masked sum is an elementwise
    # select + lane reduction at HBM bandwidth (~1 ms). Bit-identical:
    # every unselected lane contributes an exact 0.0 and 0.0 + v == v.
    onehot = safe_target[..., None] == jnp.arange(logp.shape[-1],
                                                  dtype=jnp.int32)
    picked = jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    nll = jnp.where(valid, -picked, 0.0)
    return nll, valid, onehot


def _pick_class_weight(onehot: jnp.ndarray, class_weights) -> jnp.ndarray:
    """class_weights[target] via the same one-hot reduction (the vector
    gather by a [B,H,W] index array hits the identical slow lowering)."""
    cw = jnp.asarray(class_weights, jnp.float32)
    return jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                  class_weights: Optional[jnp.ndarray] = None,
                  batch_average: bool = True) -> jnp.ndarray:
    """Mean CE over non-ignored pixels; optional per-class weights.

    Matches torch CrossEntropyLoss 'mean' semantics: the normalizer is the
    sum of the weights of contributing pixels (count when unweighted).
    """
    nll, valid, onehot = _per_pixel_nll(logits, target)
    if class_weights is not None:
        w = _pick_class_weight(onehot, class_weights)
        w = jnp.where(valid, w, 0.0)
        loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
    else:
        loss = jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
    if batch_average:
        loss = loss / logits.shape[0]
    return loss


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
               gamma: float = 2.0, alpha: Optional[float] = 0.5,
               class_weights: Optional[jnp.ndarray] = None,
               batch_average: bool = True) -> jnp.ndarray:
    """Focal loss computed from the averaged CE (reference loss.py:53-70)."""
    logpt = -cross_entropy(logits, target, class_weights, batch_average=False)
    pt = jnp.exp(logpt)
    if alpha is not None:
        logpt = logpt * alpha
    loss = -((1.0 - pt) ** gamma) * logpt
    if batch_average:
        loss = loss / logits.shape[0]
    return loss


def sample_weighted_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                                  sample_weights: jnp.ndarray,
                                  class_weights: Optional[jnp.ndarray] = None,
                                  batch_average: bool = True) -> jnp.ndarray:
    """Per-sample weighted CE (reference loss.py:22-37).

    Reference semantics: per-pixel 'none' reduction (zeros at ignored pixels),
    spatial mean dividing by H*W (ignored pixels included in the denominator),
    then a weighted batch mean.
    """
    nll, valid, onehot = _per_pixel_nll(logits, target)
    if class_weights is not None:
        nll = nll * jnp.where(valid, _pick_class_weight(onehot, class_weights),
                              0.0)
    per_sample = jnp.mean(nll, axis=(1, 2))
    loss = jnp.mean(per_sample * sample_weights)
    if batch_average:
        loss = loss / logits.shape[0]
    return loss


def build_loss(mode: str = "ce", class_weights: Optional[jnp.ndarray] = None,
               batch_average: bool = True):
    """Factory mirroring SegmentationLosses.build_loss (loss.py:14-20)."""
    if mode == "ce":
        return partial(cross_entropy, class_weights=class_weights,
                       batch_average=batch_average)
    if mode == "focal":
        return partial(focal_loss, class_weights=class_weights,
                       batch_average=batch_average)
    raise NotImplementedError(mode)
