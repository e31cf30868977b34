"""Uncertainty scoring kernels (vote entropy, softmax entropy/margin/conf).

Parity targets:
* vote entropy over MC argmax predictions —
  reference active_selection/mc_dropout.py:43-49 (log2, +1e-12 eps, ignore
  pixels zeroed);
* softmax entropy — ceal.py:114-119; max-softmax confidence — ceal.py:36-39
  (masked pixels forced to 1); best-minus-second margin — ceal.py:83-91
  (masked pixels forced to 1).

The reference loops over classes and images in Python with a per-image
GPU->CPU `.item()`; here each scorer is one fused jitted kernel over the
whole batch, returning per-pixel maps and/or per-image scalars that stay on
device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG2_EPS = 1e-12


def valid_mask(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """True where the ground-truth label is a real class (ref mc_dropout.py:45)."""
    lab = labels.astype(jnp.int32)
    return (lab >= 0) & (lab < num_classes)


def unpack_mask(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inverse of ``np.packbits(mask, axis=-1)`` (MSB-first): uint8
    (..., ceil(W/8)) -> bool (..., W).

    Device half of the packed-mask scoring wire (data/loader.PathsLoader
    ``labels_as_mask``): MC scorers read labels ONLY through valid_mask,
    so the host ships the 1-bit predicate at 8 pixels/byte instead of the
    uint8 label plane — the relay link is bandwidth-bound and the label
    plane was 1/4 of every scoring batch's bytes."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)
    return bits[..., :width].astype(bool)


def vote_entropy_from_counts(counts: jnp.ndarray, num_steps: int) -> jnp.ndarray:
    """Per-pixel vote entropy from per-class vote counts.

    counts: (..., C) float/int votes summing to num_steps per pixel.
    Matches mc_dropout.py:46-48: p = votes/S; H = -sum p*log2(p + 1e-12).
    """
    p = counts.astype(jnp.float32) / float(num_steps)
    return -jnp.sum(p * jnp.log2(p + LOG2_EPS), axis=-1)


def accumulate_votes(counts: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Add one MC step's argmax votes to a (..., C) count accumulator."""
    num_classes = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    return counts + jax.nn.one_hot(pred, num_classes, dtype=counts.dtype)


def masked_vote_entropy(counts: jnp.ndarray, labels: jnp.ndarray,
                        num_steps: int, num_classes: int) -> jnp.ndarray:
    ent = vote_entropy_from_counts(counts, num_steps)
    return jnp.where(valid_mask(labels, num_classes), ent, 0.0)


def softmax_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                    num_classes: int) -> jnp.ndarray:
    """Per-pixel softmax entropy, zeroed at ignored pixels (ceal.py:114-119)."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ent = -jnp.sum(p * jnp.log2(p + LOG2_EPS), axis=-1)
    return jnp.where(valid_mask(labels, num_classes), ent, 0.0)


def max_confidence(logits: jnp.ndarray, labels: jnp.ndarray,
                   num_classes: int) -> jnp.ndarray:
    """Per-pixel max softmax probability; ignored pixels -> 1 (ceal.py:36-39)."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    conf = jnp.max(p, axis=-1)
    return jnp.where(valid_mask(labels, num_classes), conf, 1.0)


def margin(logits: jnp.ndarray, labels: jnp.ndarray,
           num_classes: int) -> jnp.ndarray:
    """Best-minus-second-best softmax margin; ignored pixels -> 1 (ceal.py:83-91)."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top2 = jax.lax.top_k(p, 2)[0]
    m = top2[..., 0] - top2[..., 1]
    return jnp.where(valid_mask(labels, num_classes), m, 1.0)


def mean_over_pixels(maps: jnp.ndarray) -> jnp.ndarray:
    """Per-image mean over the spatial map (the reference's image score)."""
    return jnp.mean(maps.astype(jnp.float32), axis=(1, 2))
