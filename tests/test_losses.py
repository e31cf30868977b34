"""Loss parity tests against the torch oracle (reference utils/loss.py)."""

import numpy as np
import pytest
import torch

from deep_active_semantic_segmentation_tpu.ops import losses


def _torch_ce(logits_nhwc, target, weight=None, batch_average=True):
    logit = torch.from_numpy(np.transpose(logits_nhwc, (0, 3, 1, 2)))
    tgt = torch.from_numpy(target)
    crit = torch.nn.CrossEntropyLoss(
        weight=None if weight is None else torch.from_numpy(weight.astype(np.float32)),
        ignore_index=255, reduction="mean")
    loss = crit(logit, tgt.long())
    if batch_average:
        loss = loss / logit.shape[0]
    return float(loss)


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _rand_target(b, h, w, c, seed=1, ignore_frac=0.2):
    rng = np.random.RandomState(seed)
    t = rng.randint(0, c, size=(b, h, w)).astype(np.float32)
    mask = rng.rand(b, h, w) < ignore_frac
    t[mask] = 255
    return t


@pytest.mark.parametrize("weighted", [False, True])
def test_cross_entropy_matches_torch(weighted):
    b, h, w, c = 3, 9, 11, 5
    logits = _rand((b, h, w, c))
    target = _rand_target(b, h, w, c)
    weight = np.abs(_rand((c,), seed=7)) + 0.1 if weighted else None
    ours = float(losses.cross_entropy(logits, target, class_weights=weight))
    ref = _torch_ce(logits, target, weight)
    assert abs(ours - ref) < 1e-5


def test_cross_entropy_all_ignored_is_finite():
    b, h, w, c = 2, 4, 4, 3
    logits = _rand((b, h, w, c))
    target = np.full((b, h, w), 255, np.float32)
    assert np.isfinite(float(losses.cross_entropy(logits, target)))


def test_focal_matches_torch_formula():
    b, h, w, c = 2, 8, 8, 4
    logits = _rand((b, h, w, c), seed=3)
    target = _rand_target(b, h, w, c, seed=4)
    ce = _torch_ce(logits, target, batch_average=False)
    logpt = -ce
    pt = np.exp(logpt)
    expected = (-((1 - pt) ** 2) * (0.5 * logpt)) / b
    ours = float(losses.focal_loss(logits, target, gamma=2, alpha=0.5))
    assert abs(ours - expected) < 1e-5


def test_sample_weighted_ce_zero_weight_drops_sample():
    b, h, w, c = 2, 6, 6, 4
    logits = _rand((b, h, w, c), seed=5)
    target = _rand_target(b, h, w, c, seed=6, ignore_frac=0.0)
    full = float(losses.sample_weighted_cross_entropy(
        logits, target, np.array([1.0, 0.0], np.float32)))
    only_first = float(losses.sample_weighted_cross_entropy(
        logits[:1], target[:1], np.array([1.0], np.float32)))
    # full: mean([l0, 0]) = l0/2, then /2 batch avg = l0/4;
    # only_first: mean([l0]) = l0, then /1 batch avg = l0.
    assert abs(full - only_first / 4) < 1e-6


def test_build_loss_factory():
    fn = losses.build_loss("ce")
    b, h, w, c = 1, 4, 4, 3
    out = float(fn(_rand((b, h, w, c)), _rand_target(b, h, w, c)))
    assert np.isfinite(out)
    with pytest.raises(NotImplementedError):
        losses.build_loss("dice")


def test_onehot_pick_bit_equals_gather_formulation():
    """The TPU-fast one-hot masked reduction in _per_pixel_nll must be
    BIT-identical to the take_along_axis gather it replaced (it removed a
    37.8 ms serial dynamic-gather from the 513^2 train step; BASELINE.md).
    Unselected lanes contribute an exact 0.0, and 0.0 + v == v."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = 2, 9, 9, 19
    logits = jnp.asarray(_rand((b, h, w, c), seed=11))
    target = jnp.asarray(_rand_target(b, h, w, c, seed=12))
    cw = np.random.RandomState(13).rand(c).astype(np.float32)

    valid = target != 255
    safe = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, -picked, 0.0)
    wmap = jnp.where(valid, jnp.asarray(cw)[safe], 0.0)
    ref_weighted = float((jnp.sum(nll * wmap) / jnp.sum(wmap)) / b)
    ref_plain = float((jnp.sum(nll) / jnp.sum(valid)) / b)

    assert float(losses.cross_entropy(logits, target,
                                      class_weights=cw)) == ref_weighted
    assert float(losses.cross_entropy(logits, target)) == ref_plain
