"""Jitted scoring kernels shared by the selectors.

Each kernel processes a WHOLE batch on device in one fused computation —
the reference's per-image python loops with `.cpu().item()` round-trips
(mc_dropout.py:30-80,189) collapse into one jit call returning per-image
scalars (or per-image score maps for the region pipeline). The flax module
is a static argument, so each (model config, batch shape) compiles once.

MC sampling is a ``lax.scan`` over MC_STEPS dropout keys accumulating the
per-class vote histogram — constant memory in the number of steps, and XLA
overlaps the scan iterations' HBM traffic with MXU work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.ops import entropy as ent_ops


@partial(jax.jit, static_argnames=("model", "num_classes", "num_steps",
                                   "noise_mode"))
def mc_vote_entropy_maps(model, variables, images, labels, rng,
                         num_classes: int, num_steps: int,
                         noise_mode: str = "dropout"):
    """(B,H,W) masked vote-entropy maps over ``num_steps`` stochastic
    forwards.

    noise_mode:
      'dropout' — MC dropout (reference mc_dropout.py:30-49);
      'input'   — additive input gaussian sigma=0.125 (mc_noise.py:21-44);
      'feature' — model-internal feature noise (mc_noise.py:62-84).
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]

    def step(counts, key):
        if noise_mode == "dropout":
            logits = model.apply(variables, images, train=False,
                                 use_dropout=True, rngs={"dropout": key})
        elif noise_mode == "input":
            noisy = images + 0.125 * jax.random.normal(key, images.shape,
                                                       jnp.float32)
            logits = model.apply(variables, noisy, train=False)
        elif noise_mode == "feature":
            logits = model.apply(variables, images, train=False,
                                 noisy_features=True, rngs={"noise": key})
        else:
            raise NotImplementedError(noise_mode)
        return ent_ops.accumulate_votes(counts, logits), None

    counts0 = jnp.zeros((b, h, w, num_classes), jnp.float32)
    counts, _ = jax.lax.scan(step, counts0, jax.random.split(rng, num_steps))
    return ent_ops.masked_vote_entropy(counts, labels, num_steps, num_classes)


@partial(jax.jit, static_argnames=("model", "num_classes", "mode"))
def softmax_score_per_image(model, variables, images, labels,
                            num_classes: int, mode: str):
    """Single deterministic forward -> per-image mean score map.

    mode: 'confidence' (ceal.py:19-70), 'margin' (ceal.py:72-98),
    'entropy' (ceal.py:100-126).
    """
    logits = model.apply(variables, images, train=False)
    if mode == "confidence":
        maps = ent_ops.max_confidence(logits, labels, num_classes)
    elif mode == "margin":
        maps = ent_ops.margin(logits, labels, num_classes)
    elif mode == "entropy":
        maps = ent_ops.softmax_entropy(logits, labels, num_classes)
    else:
        raise NotImplementedError(mode)
    return ent_ops.mean_over_pixels(maps)


@partial(jax.jit, static_argnames=("model", "num_classes"))
def softmax_entropy_maps(model, variables, images, labels, num_classes: int):
    logits = model.apply(variables, images, train=False)
    return ent_ops.softmax_entropy(logits, labels, num_classes)


@partial(jax.jit, static_argnames=("model", "num_classes"))
def weak_label_predictions(model, variables, images, labels, num_classes: int):
    """argmax predictions with 255 at ignored pixels (ceal.py:158-164)."""
    logits = model.apply(variables, images, train=False)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    valid = ent_ops.valid_mask(labels, num_classes)
    return jnp.where(valid, pred, jnp.uint8(255))


@partial(jax.jit, static_argnames=("model", "pool_kernel", "pool_stride"))
def pooled_features(model, variables, images, pool_kernel: int,
                    pool_stride: int):
    """Decoder feature tap -> avg-pooled, flattened per-image vectors
    (core_set.py:57-63, max_subset.py:73-89)."""
    from deep_active_semantic_segmentation_tpu.ops.interpolate import avg_pool2d

    _, feats = model.apply(variables, images, train=False,
                           return_features=True)
    pooled = avg_pool2d(feats, pool_kernel, pool_stride)
    return pooled.reshape(pooled.shape[0], -1)


@partial(jax.jit, static_argnames=("model",))
def raw_features(model, variables, images):
    _, feats = model.apply(variables, images, train=False,
                           return_features=True)
    return feats


@partial(jax.jit, static_argnames=("model", "num_classes"))
def misprediction_counts(model, variables, images, labels, num_classes: int):
    """Oracle: count mispredicted valid pixels (accuracy.py:18-37)."""
    out = model.apply(variables, images, train=False)
    logits = out[0] if isinstance(out, tuple) else out  # seg head if two-headed
    pred = jnp.argmax(logits, axis=-1)
    valid = ent_ops.valid_mask(labels, num_classes)
    wrong = valid & (pred != labels.astype(jnp.int32))
    return jnp.sum(wrong, axis=(1, 2)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("model", "num_classes", "mode"))
def error_head_scores(model, variables, images, labels, num_classes: int,
                      mode: str):
    """Two-headed model scoring (accuracy.py:39-71,98-117).

    mode 'softmax': sum of P(error) over valid pixels;
    mode 'argmax': count of predicted-wrong pixels;
    mode 'unsure': mean of 4p-4p^2 (p = P(correct)) over valid pixels.
    """
    _, err_logits = model.apply(variables, images, train=False)
    valid = ent_ops.valid_mask(labels, num_classes)
    if mode == "softmax":
        p_err = jax.nn.softmax(err_logits, axis=-1)[..., 0]
        return jnp.sum(jnp.where(valid, p_err, 0.0), axis=(1, 2))
    if mode == "argmax":
        pred_wrong = 1.0 - jnp.argmax(err_logits, axis=-1).astype(jnp.float32)
        return jnp.sum(jnp.where(valid, pred_wrong, 0.0), axis=(1, 2))
    if mode == "unsure":
        p = jax.nn.softmax(err_logits, axis=-1)[..., 1]
        y = 4.0 * p - 4.0 * p * p
        # reference takes mean over the VALID pixels only (accuracy.py:113)
        n = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1)
        return jnp.sum(jnp.where(valid, y, 0.0), axis=(1, 2)) / n
    raise NotImplementedError(mode)


@partial(jax.jit, static_argnames=("model", "num_classes"))
def error_head_maps(model, variables, images, labels, num_classes: int):
    """P(error) maps, zeroed at ignored pixels (accuracy.py:131-161)."""
    _, err_logits = model.apply(variables, images, train=False)
    p_err = jax.nn.softmax(err_logits, axis=-1)[..., 0]
    valid = ent_ops.valid_mask(labels, num_classes)
    return jnp.where(valid, p_err, 0.0)


@partial(jax.jit, static_argnames=("model", "num_classes"))
def input_gradient_norms(model, variables, images, labels, num_classes: int):
    """||d sum(unet_out) / d unet_input||_2 per pixel, mean over the map
    (accuracy.py:73-96: the only selector that runs backward)."""
    seg_logits, _ = model.apply(variables, images, train=False)
    probs = jax.nn.softmax(seg_logits, axis=-1)
    unet_input = jnp.concatenate([probs, images], axis=-1)

    def head_sum(inp):
        out = model.apply(variables, images, train=False,
                          unet_only_input=inp)
        return jnp.sum(out)

    grads = jax.grad(head_sum)(unet_input)
    norms = jnp.sqrt(jnp.sum(grads * grads, axis=-1))
    valid = ent_ops.valid_mask(labels, num_classes)
    norms = jnp.where(valid, norms, 0.0)
    return jnp.mean(norms, axis=(1, 2))
