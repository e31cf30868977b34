"""Bottleneck ResNet backbone with multi-grid layer4.

Parity: reference models/backbone/resnet.py — output-stride 16/8
stride-dilation tables (resnet.py:56-61), ``_make_MG_unit`` multi-grid
[1, 2, 4] in layer4 (resnet.py:116-132), low-level feature tap after layer1
(resnet.py:88-89).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from deep_active_semantic_segmentation_tpu.models.layers import batch_norm, conv


def _max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MaxPool2d(kernel_size=3, stride=2, padding=1)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        ura = not train
        norm = lambda n: batch_norm(name=n, axis_name=self.bn_axis_name)
        out = conv(self.planes, 1, name="conv1")(x)
        out = nn.relu(norm("bn1")(out, use_running_average=ura))
        out = conv(self.planes, 3, self.stride, padding=self.dilation,
                   dilation=self.dilation, name="conv2")(out)
        out = nn.relu(norm("bn2")(out, use_running_average=ura))
        out = conv(self.planes * self.expansion, 1, name="conv3")(out)
        out = norm("bn3")(out, use_running_average=ura)
        residual = x
        if self.has_downsample:
            residual = conv(self.planes * self.expansion, 1, self.stride,
                            name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual, use_running_average=ura)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    layers: Sequence[int]
    output_stride: int = 16
    bn_axis_name: Optional[str] = None
    multi_grid: Sequence[int] = (1, 2, 4)

    @nn.compact
    def __call__(self, x, train: bool = False, use_dropout: Optional[bool] = None,
                 features_only: bool = False, precomputed=None):
        # No MC-dropout sites in this backbone (reference resnet.py), so
        # the MC-scan backbone hoist (selection/kernels.py) is trivial:
        # precomputed features pass straight through.
        if precomputed is not None:
            return precomputed
        if self.output_stride == 16:
            strides, dilations = [1, 2, 2, 1], [1, 1, 1, 2]
        elif self.output_stride == 8:
            strides, dilations = [1, 2, 1, 1], [1, 1, 2, 4]
        else:
            raise NotImplementedError(self.output_stride)
        ura = not train

        y = conv(64, 7, 2, 3, name="conv1")(x)
        y = batch_norm(name="bn1", axis_name=self.bn_axis_name)(
            y, use_running_average=ura)
        y = nn.relu(y)
        y = _max_pool_3x3_s2_p1(y)

        inplanes = 64
        low_level_feat = None
        for stage, (planes, blocks) in enumerate(
                zip([64, 128, 256, 512], self.layers)):
            stride, dilation = strides[stage], dilations[stage]
            if stage < 3:
                for i in range(blocks):
                    has_ds = i == 0 and (stride != 1 or inplanes != planes * 4)
                    y = Bottleneck(planes, stride if i == 0 else 1, dilation,
                                   has_ds, self.bn_axis_name,
                                   name=f"layer{stage+1}_{i}")(y, train)
                    inplanes = planes * 4
                if stage == 0:
                    low_level_feat = y
            else:
                # multi-grid unit (resnet.py:116-132)
                for i, grid in enumerate(self.multi_grid):
                    has_ds = i == 0 and (stride != 1 or inplanes != planes * 4)
                    y = Bottleneck(planes, stride if i == 0 else 1,
                                   grid * dilation, has_ds, self.bn_axis_name,
                                   name=f"layer4_{i}")(y, train)
                    inplanes = planes * 4
        return y, low_level_feat


def ResNet50(output_stride: int, bn_axis_name: Optional[str] = None) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), output_stride=output_stride,
                  bn_axis_name=bn_axis_name)


def ResNet101(output_stride: int, bn_axis_name: Optional[str] = None) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), output_stride=output_stride,
                  bn_axis_name=bn_axis_name)
