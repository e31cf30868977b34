"""Small 4-level UNet (parity: reference models/unet.py:18-71).

32-64-128-256 double-conv encoder with 2x2 max-pool, bilinear align-corners
skip upsampling with concat, 1x1 classifier, final resize to input size.
Used standalone for SEM binary segmentation and as the error-prediction head
of the two-headed accuracy predictor.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.models.layers import batch_norm, conv
from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    max_pool2d, resize_bilinear_align_corners)


class DoubleConv(nn.Module):
    features: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        ura = not train
        for i in range(2):
            x = conv(self.features, 3, 1, 1, bias=True, name=f"conv{i}")(x)
            x = batch_norm(name=f"bn{i}", axis_name=self.bn_axis_name)(
                x, use_running_average=ura)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 2
    bn_axis_name: Optional[str] = None

    model_name: str = "unet"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 use_dropout: Optional[bool] = None,
                 return_features: bool = False,
                 noisy_features: bool = False):
        h, w = x.shape[1], x.shape[2]
        dc = lambda f, n: DoubleConv(f, self.bn_axis_name, name=n)
        conv1 = dc(32, "dconv_down1")(x, train)
        y = max_pool2d(conv1, 2)
        conv2 = dc(64, "dconv_down2")(y, train)
        y = max_pool2d(conv2, 2)
        conv3 = dc(128, "dconv_down3")(y, train)
        y = max_pool2d(conv3, 2)
        y = dc(256, "dconv_down4")(y, train)

        y = resize_bilinear_align_corners(y, conv3.shape[1], conv3.shape[2])
        y = dc(128, "dconv_up3")(jnp.concatenate([y, conv3], -1), train)
        y = resize_bilinear_align_corners(y, conv2.shape[1], conv2.shape[2])
        y = dc(64, "dconv_up2")(jnp.concatenate([y, conv2], -1), train)
        y = resize_bilinear_align_corners(y, conv1.shape[1], conv1.shape[2])
        y = dc(32, "dconv_up1")(jnp.concatenate([y, conv1], -1), train)

        out = conv(self.num_classes, 1, bias=True, name="conv_last")(y)
        return resize_bilinear_align_corners(out, h, w)
