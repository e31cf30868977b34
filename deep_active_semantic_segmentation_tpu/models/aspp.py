"""Atrous Spatial Pyramid Pooling (parity: reference models/aspp.py:8-101).

Four atrous branches (dilations 1/6/12/18 at os16, 1/12/24/36 at os8) plus a
global-average-pool branch upsampled with align-corners bilinear, concat ->
1x1 conv 1280->256 -> BN -> ReLU -> Dropout2d(0.5). The 0.5 dropout is a
plain Dropout2d, so it participates in MC-dropout sampling exactly as in the
reference (turn_on_dropout flips every Dropout2d, mc_dropout.py:175-178).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.models.layers import (
    Dropout2d, batch_norm, conv)
from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    global_avg_pool, resize_bilinear_align_corners)


class ASPPModule(nn.Module):
    planes: int
    kernel_size: int
    padding: int
    dilation: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.planes, self.kernel_size, 1, self.padding,
                 dilation=self.dilation, name="atrous_conv")(x)
        x = batch_norm(name="bn", axis_name=self.bn_axis_name)(
            x, use_running_average=not train)
        return nn.relu(x)


class ASPP(nn.Module):
    output_stride: int = 16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, use_dropout: bool):
        if self.output_stride == 16:
            dilations = [1, 6, 12, 18]
        elif self.output_stride == 8:
            dilations = [1, 12, 24, 36]
        else:
            raise NotImplementedError(self.output_stride)
        ura = not train

        x1 = ASPPModule(256, 1, 0, dilations[0], self.bn_axis_name,
                        name="aspp1")(x, train)
        x2 = ASPPModule(256, 3, dilations[1], dilations[1], self.bn_axis_name,
                        name="aspp2")(x, train)
        x3 = ASPPModule(256, 3, dilations[2], dilations[2], self.bn_axis_name,
                        name="aspp3")(x, train)
        x4 = ASPPModule(256, 3, dilations[3], dilations[3], self.bn_axis_name,
                        name="aspp4")(x, train)

        # image-pool branch (aspp.py:62-65,79-81): pool -> 1x1 conv -> ReLU,
        # bilinear-upsample, then BN
        x5 = global_avg_pool(x)
        x5 = conv(256, 1, 1, 0, name="gap_conv")(x5)
        x5 = nn.relu(x5)
        x5 = resize_bilinear_align_corners(x5, x4.shape[1], x4.shape[2])
        x5 = batch_norm(name="gap_bn", axis_name=self.bn_axis_name)(
            x5, use_running_average=ura)

        y = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
        y = conv(256, 1, name="conv1")(y)
        y = batch_norm(name="bn1", axis_name=self.bn_axis_name)(
            y, use_running_average=ura)
        y = nn.relu(y)
        return Dropout2d(0.5, name="dropout")(y, deterministic=not use_dropout)
