"""Align-corners bilinear resize + pooling parity vs torch."""

import numpy as np
import torch
import torch.nn.functional as F

from deep_active_semantic_segmentation_tpu.ops import interpolate


def _torch_resize(x_nhwc, oh, ow):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    out = F.interpolate(t, size=(oh, ow), mode="bilinear", align_corners=True)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def test_bilinear_align_corners_upsample_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 33, 33, 5).astype(np.float32)
    for (oh, ow) in [(129, 129), (513, 513), (60, 45)]:
        ours = np.asarray(interpolate.resize_bilinear_align_corners(x, oh, ow))
        ref = _torch_resize(x, oh, ow)
        assert np.allclose(ours, ref, atol=2e-5), (oh, ow)


def test_bilinear_downsample_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 65, 129, 3).astype(np.float32)
    ours = np.asarray(interpolate.resize_bilinear_align_corners(x, 17, 33))
    ref = _torch_resize(x, 17, 33)
    assert np.allclose(ours, ref, atol=2e-5)


def test_avg_pool_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 64, 64, 7).astype(np.float32)
    ours = np.asarray(interpolate.avg_pool2d(x, 64, 32))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = np.transpose(F.avg_pool2d(t, (64, 64), 32).numpy(), (0, 2, 3, 1))
    assert np.allclose(ours, ref, atol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 33, 33, 4).astype(np.float32)
    ours = np.asarray(interpolate.max_pool2d(x, 2))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = np.transpose(F.max_pool2d(t, 2).numpy(), (0, 2, 3, 1))
    assert np.allclose(ours, ref)
