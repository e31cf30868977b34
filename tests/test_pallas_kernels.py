"""Pallas fused upsample+argmax kernel (interpreter mode on the CPU test
mesh) vs the einsum reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    resize_bilinear_align_corners)
from deep_active_semantic_segmentation_tpu.ops.pallas.upsample_argmax import (
    supports, upsample4_argmax)


def test_supports_geometry():
    assert supports((129, 129), (513, 513))
    assert supports((17, 17), (65, 65))
    assert not supports((129, 129), (512, 512))
    assert not supports((128, 128), (513, 513))


def test_fused_upsample_argmax_matches_einsum_path():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 17, 17, 7).astype(np.float32)
    votes = np.asarray(upsample4_argmax(jnp.asarray(x)))
    ref = np.asarray(jnp.argmax(
        resize_bilinear_align_corners(jnp.asarray(x), 65, 65), axis=-1))
    assert votes.shape == ref.shape == (2, 65, 65)
    # interpolation association is identical; tiny MXU-precision
    # differences can flip only exact-tie pixels
    agreement = (votes == ref).mean()
    assert agreement > 0.995, agreement
    # spot-check exactness where the interpolated argmax gap is material
    full = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 65, 65))
    top2 = np.sort(full, axis=-1)
    confident = (top2[..., -1] - top2[..., -2]) > 1e-3
    assert (votes[confident] == ref[confident]).all()


def test_fused_path_sampling_statistics_match_standard():
    """The MC kernel's fused and standard paths agree on vote entropy."""
    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.selection.kernels import (
        mc_vote_entropy_maps)

    model = DeepLab(num_classes=5, backbone="mobilenet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 33, 33, 3), jnp.float32), train=False)
    im = jax.random.normal(jax.random.PRNGKey(1), (2, 33, 33, 3), jnp.float32)
    lb = jnp.zeros((2, 33, 33), jnp.float32)
    a = np.asarray(mc_vote_entropy_maps(model, variables, im, lb,
                                        jax.random.PRNGKey(2), 5, 8,
                                        "dropout", fused_upsample=False))
    b = np.asarray(mc_vote_entropy_maps(model, variables, im, lb,
                                        jax.random.PRNGKey(2), 5, 8,
                                        "dropout", fused_upsample=True))
    # same dropout keys -> same stochastic forwards; votes may differ only
    # at near-tie pixels, so the entropy maps are nearly identical
    assert np.mean(np.abs(a - b)) < 0.02
    assert (a == b).mean() > 0.98
