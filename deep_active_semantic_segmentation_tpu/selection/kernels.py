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

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.ops import entropy as ent_ops

# ImageNet normalization constants (data/transforms.py IMAGENET_MEAN/STD)
_NORM_MEAN = (0.485, 0.456, 0.406)
_NORM_STD = (0.229, 0.224, 0.225)


def normalize_on_device(images):
    """Device half of the uint8 scoring fast path (data/loader.py
    ``device_normalize``): uint8 batches are normalized here with exactly
    the host Normalize math (transforms.py:67-79) — elementwise f32 is
    bit-identical across host and TPU, unlike matmuls. Float inputs pass
    through untouched (already normalized on host)."""
    if images.dtype != jnp.uint8:
        return images
    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(_NORM_MEAN, jnp.float32)) / jnp.asarray(
        _NORM_STD, jnp.float32)


def _cast_floats(tree, dtype):
    """Cast every floating leaf (params AND batch_stats — eval-mode BN
    normalizes with the running stats, so they must ride the compute
    dtype too) while leaving integer leaves untouched."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def _mc_vote_entropy(model, variables, images, labels, rng,
                     num_classes: int, num_steps: int,
                     noise_mode: str = "dropout",
                     fused_upsample: bool = False,
                     compute_dtype: str = "float32",
                     labels_packed: bool = False):
    """(B,H,W) masked vote-entropy maps over ``num_steps`` stochastic
    forwards (traceable body — jitted single-device via
    ``mc_vote_entropy_maps``, or per-shard inside the shard_map of
    ``mc_vote_entropy_maps_sharded``).

    noise_mode:
      'dropout' — MC dropout (reference mc_dropout.py:30-49);
      'input'   — additive input gaussian sigma=0.125 (mc_noise.py:21-44);
      'feature' — model-internal feature noise (mc_noise.py:62-84).

    fused_upsample: take decoder-resolution logits and vote through the
    Pallas fused 4x-upsample+argmax kernel (ops/pallas/upsample_argmax) —
    the (B,H,W,C) full-resolution logits never materialize. Applies when
    the model supports ``upsample_logits=False`` and the geometry is an
    exact 4x; falls back transparently otherwise.

    compute_dtype: 'float32' | 'bfloat16' — dtype of the stochastic
    forwards (params, running BN stats and normalized images are cast; the
    noise draws ride the same dtype). Votes are per-pixel argmaxes, which
    are robust to bf16 rounding (validated against the MC seed-to-seed
    band, see BASELINE.md); the entropy reduction over the uint8 vote
    stack always runs f32.

    labels_packed: ``labels`` is the packed 1-bit valid mask
    (B, H, ceil(W/8)) from PathsLoader ``labels_as_mask`` instead of the
    label plane — exact (this kernel reads labels only through
    valid_mask) at 1/8 the label wire bytes.
    """
    from deep_active_semantic_segmentation_tpu.ops import tconv_votes as tv
    from deep_active_semantic_segmentation_tpu.ops.pallas import (
        tconv_votes_fused as tvf, upsample_argmax as ua)

    images = normalize_on_device(images)
    cdt = jnp.dtype(compute_dtype)
    if cdt != jnp.float32:
        images = images.astype(cdt)
        variables = _cast_floats(variables, cdt)

    # Backbone hoist: for 'dropout' mode on DeepLab every stochastic site
    # sits at or after the backbone outputs (trailing + low-level dropout,
    # models/backbone/mobilenet.py; ASPP + decoder dropout), so the
    # deterministic backbone is computed ONCE per batch and only
    # dropout->ASPP->decoder->vote iterates in the scan. Bit-compatible
    # with the monolithic forward: the dropout rng folds are module-path
    # based and the paths are unchanged (models/deeplab.py docstring);
    # regression-tested in tests/test_sharded_scoring.py.
    backbone_feats = None
    prefix_feats = None
    if noise_mode == "dropout" and getattr(model, "model_name", "") == "deeplab":
        backbone_feats = model.apply(variables, images, train=False,
                                     backbone_only=True)
    elif noise_mode == "dropout" and getattr(model, "model_name", "") == "enet":
        # ENet deterministic-prefix hoist: the InitialBlock (full-res
        # conv+pool, the per-HLO trace's biggest per-step fusion) PLUS
        # downsample1_0 up to its dropout site (the stage-1 pool
        # tournament + ext convs, ~13 ms of the scan body) run once;
        # each scan step replays dropout+merge on (models/enet.py
        # prefix_only/prefix_features protocol)
        prefix_feats = model.apply(variables, images, train=False,
                                   prefix_only=True)

    def forward(key, upsample: bool):
        kwargs = {} if upsample else {"upsample_logits": False}
        if noise_mode == "dropout":
            if backbone_feats is not None:
                kwargs["backbone_features"] = backbone_feats
            if prefix_feats is not None:
                kwargs["prefix_features"] = prefix_feats
            return model.apply(variables, images, train=False,
                               use_dropout=True, rngs={"dropout": key},
                               **kwargs)
        if noise_mode == "input":
            noisy = images + 0.125 * jax.random.normal(key, images.shape,
                                                       images.dtype)
            return model.apply(variables, noisy, train=False, **kwargs)
        if noise_mode == "feature":
            return model.apply(variables, images, train=False,
                               noisy_features=True, rngs={"noise": key},
                               **kwargs)
        raise NotImplementedError(noise_mode)

    fused_kind = None
    model_name = getattr(model, "model_name", "")
    if fused_upsample and model_name in ("deeplab", "enet"):
        low_shape = jax.eval_shape(lambda k: forward(k, False), rng).shape
        if model_name == "deeplab" and ua.supports(low_shape[1:3],
                                                   images.shape[1:3]):
            # bilinear 4x decoders: Pallas fused upsample+argmax
            fused_kind = "bilinear4x"
        elif model_name == "enet" and tv.supports(low_shape[1:3],
                                                  images.shape[1:3]):
            # learned-upsample decoders: parity-decomposed tconv+argmax
            # (XLA's conv(lhs_dilation)+argmax fusion measured 15.6 ms of
            # a ~25 ms MC step on v5e — ops/tconv_votes.py docstring)
            fused_kind = "tconv2x"

    def step(_, key):
        if fused_kind == "bilinear4x":
            votes = ua.upsample4_argmax(forward(key, False))
        elif fused_kind == "tconv2x":
            # PARITY-MAJOR (B,4,h,w) votes from the fully-fused Pallas
            # vote tail: classes ride the sublane axis so the per-parity
            # argmax needs NO relayout (the XLA conv+argmax form spent
            # ~13 ms/step on pure layout copies — r5 trace, see
            # ops/pallas/tconv_votes_fused.py); entropy is per-pixel, so
            # the scan stays packed and the interleave happens ONCE on
            # the entropy map below
            tk = variables["params"]["transposed_conv"]["kernel"]
            votes = tvf.tconv2x_argmax_parity_major(forward(key, False), tk)
        else:
            votes = jnp.argmax(forward(key, True), axis=-1)
        # compact uint8 votes: writing (B,H,W) per step instead of
        # read-modify-writing a (B,H,W,C) histogram cuts the scan's HBM
        # traffic by ~2C (the tail used to cost as much as the forwards)
        return 0, votes.astype(jnp.uint8)

    _, votes = jax.lax.scan(step, 0, jax.random.split(rng, num_steps))
    # (S,B,H,W) uint8 -> per-class counts -> entropy; the stack is tiny
    # (S*B*H*W bytes) so the C passes over it are cheap
    ent = jnp.zeros(votes.shape[1:], jnp.float32)
    for c in range(num_classes):
        p = jnp.sum(votes == c, axis=0).astype(jnp.float32) / num_steps
        ent = ent - p * jnp.log2(p + ent_ops.LOG2_EPS)
    if fused_kind == "tconv2x":
        # parity-major -> (B, 2h, 2w), once
        ent = tv.interleave_parity_major(ent)
    mask = (ent_ops.unpack_mask(labels, images.shape[2]) if labels_packed
            else ent_ops.valid_mask(labels, num_classes))
    return jnp.where(mask, ent, 0.0)


mc_vote_entropy_maps = partial(jax.jit, static_argnames=(
    "model", "num_classes", "num_steps", "noise_mode", "fused_upsample",
    "compute_dtype", "labels_packed"))(_mc_vote_entropy)


@lru_cache(maxsize=64)
def _sharded_mc_fn(mesh, model, num_classes: int, num_steps: int,
                   noise_mode: str, fused_upsample: bool,
                   compute_dtype: str, labels_packed: bool = False):
    """Build (and cache) the shard_map-wrapped MC sweep for one static
    config. ``lru_cache`` bounds the cache (old Mesh objects and their
    compiled executables age out) and is thread-safe, unlike the plain
    module dict it replaces."""
    from jax.sharding import Mesh, PartitionSpec as P

    flat = Mesh(mesh.devices.reshape(-1), ("pool",))

    def local(variables, images, labels, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("pool"))
        return _mc_vote_entropy(model, variables, images, labels, rng,
                                num_classes, num_steps, noise_mode,
                                fused_upsample, compute_dtype, labels_packed)

    return jax.jit(jax.shard_map(
        local, mesh=flat,
        in_specs=(P(), P("pool"), P("pool"), P()),
        out_specs=P("pool"), check_vma=False))


def mc_vote_entropy_maps_sharded(mesh, model, variables, images, labels, rng,
                                 num_classes: int, num_steps: int,
                                 noise_mode: str = "dropout",
                                 fused_upsample: bool = False,
                                 compute_dtype: str = "float32",
                                 labels_packed: bool = False):
    """Pool scoring sharded over every device of ``mesh`` (flattened to a
    1-D 'pool' axis): each chip runs the full MC sweep on its slice of the
    batch — the AL hot loop (MC_STEPS x |pool| forwards) is embarrassingly
    batch-parallel, so scale-out is a shard_map with zero collectives.
    Params are replicated; per-shard dropout keys are decorrelated by
    folding the shard index into ``rng`` (the reference's MC draws are
    i.i.d. across images anyway, mc_dropout.py:39-40). Requires
    batch % n_devices == 0 (PathsLoader pads every batch to full size)."""
    fn = _sharded_mc_fn(mesh, model, num_classes, num_steps, noise_mode,
                        fused_upsample, compute_dtype, labels_packed)
    return fn(variables, images, labels, rng)


def _unpacked_labels(labels, images, num_classes: int, labels_packed: bool):
    """Resolve the packed-mask wire for mask-only kernels: synthesize a
    labels plane whose valid_mask equals the shipped 1-bit predicate
    (0 where valid, num_classes where not) — every scorer below reads
    labels exclusively through valid_mask, so this is exact."""
    if not labels_packed:
        return labels
    mask = ent_ops.unpack_mask(labels, images.shape[2])
    return jnp.where(mask, 0, num_classes).astype(jnp.int32)


@partial(jax.jit, static_argnames=("model", "num_classes", "mode",
                                   "labels_packed"))
def softmax_score_per_image(model, variables, images, labels,
                            num_classes: int, mode: str,
                            labels_packed: bool = False):
    """Single deterministic forward -> per-image mean score map.

    mode: 'confidence' (ceal.py:19-70), 'margin' (ceal.py:72-98),
    'entropy' (ceal.py:100-126).
    """
    labels = _unpacked_labels(labels, images, num_classes, labels_packed)
    images = normalize_on_device(images)
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
    images = normalize_on_device(images)
    logits = model.apply(variables, images, train=False)
    return ent_ops.softmax_entropy(logits, labels, num_classes)


@partial(jax.jit, static_argnames=("model", "num_classes", "labels_packed"))
def weak_label_predictions(model, variables, images, labels, num_classes: int,
                           labels_packed: bool = False):
    """argmax predictions with 255 at ignored pixels (ceal.py:158-164)."""
    labels = _unpacked_labels(labels, images, num_classes, labels_packed)
    images = normalize_on_device(images)
    logits = model.apply(variables, images, train=False)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    valid = ent_ops.valid_mask(labels, num_classes)
    return jnp.where(valid, pred, jnp.uint8(255))


@partial(jax.jit, static_argnames=("model", "pool_kernel", "pool_stride"))
def pooled_features(model, variables, images, pool_kernel: int,
                    pool_stride: int):
    """Decoder feature tap -> avg-pooled, flattened per-image vectors
    (core_set.py:57-63, max_subset.py:73-89).

    The kernel/stride are clamped to the feature-map size: the reference's
    fixed F.avg_pool2d(64, 32) ERRORS outright when the decoder map is
    smaller than the kernel (any deeplab crop < 257), and an unclamped
    zero-window pool here yielded EMPTY feature vectors — every pairwise
    distance 0, k-center greedy degenerating to re-picking seed index 0
    (caught by tests/test_end_to_end.py loop e2e). At canonical geometry
    (crop 513 -> 129^2 deeplab features) the clamp is a no-op."""
    from deep_active_semantic_segmentation_tpu.ops.interpolate import avg_pool2d

    images = normalize_on_device(images)
    _, feats = model.apply(variables, images, train=False,
                           return_features=True)
    k = min(pool_kernel, feats.shape[1], feats.shape[2])
    s = min(pool_stride, k)
    pooled = avg_pool2d(feats, k, s)
    return pooled.reshape(pooled.shape[0], -1)


@partial(jax.jit, static_argnames=("model",))
def raw_features(model, variables, images):
    images = normalize_on_device(images)
    _, feats = model.apply(variables, images, train=False,
                           return_features=True)
    return feats


@partial(jax.jit, static_argnames=("model", "num_classes"))
def misprediction_counts(model, variables, images, labels, num_classes: int):
    """Oracle: count mispredicted valid pixels (accuracy.py:18-37)."""
    images = normalize_on_device(images)
    out = model.apply(variables, images, train=False)
    logits = out[0] if isinstance(out, tuple) else out  # seg head if two-headed
    pred = jnp.argmax(logits, axis=-1)
    valid = ent_ops.valid_mask(labels, num_classes)
    wrong = valid & (pred != labels.astype(jnp.int32))
    return jnp.sum(wrong, axis=(1, 2)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("model", "num_classes", "mode",
                                   "labels_packed"))
def error_head_scores(model, variables, images, labels, num_classes: int,
                      mode: str, labels_packed: bool = False):
    """Two-headed model scoring (accuracy.py:39-71,98-117).

    mode 'softmax': sum of P(error) over valid pixels;
    mode 'argmax': count of predicted-wrong pixels;
    mode 'unsure': mean of 4p-4p^2 (p = P(correct)) over valid pixels.
    """
    labels = _unpacked_labels(labels, images, num_classes, labels_packed)
    images = normalize_on_device(images)
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


@partial(jax.jit, static_argnames=("model", "num_classes", "labels_packed"))
def error_head_maps(model, variables, images, labels, num_classes: int,
                    labels_packed: bool = False):
    """P(error) maps, zeroed at ignored pixels (accuracy.py:131-161)."""
    labels = _unpacked_labels(labels, images, num_classes, labels_packed)
    images = normalize_on_device(images)
    _, err_logits = model.apply(variables, images, train=False)
    p_err = jax.nn.softmax(err_logits, axis=-1)[..., 0]
    valid = ent_ops.valid_mask(labels, num_classes)
    return jnp.where(valid, p_err, 0.0)


@partial(jax.jit, static_argnames=("model", "num_classes", "labels_packed"))
def input_gradient_norms(model, variables, images, labels, num_classes: int,
                         labels_packed: bool = False):
    """||d sum(unet_out) / d unet_input||_2 per pixel, mean over the map
    (accuracy.py:73-96: the only selector that runs backward)."""
    labels = _unpacked_labels(labels, images, num_classes, labels_packed)
    images = normalize_on_device(images)
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
