"""Fast-SCNN (parity: reference models/fastscnn.py:6-194).

learning-to-downsample -> global feature extractor (inverted residuals +
PSP pooling) -> feature fusion -> classifier -> align-corners upsample.
The reference's Classifier applies ``sconv1`` twice (fastscnn.py:178-179);
reproduced verbatim (parameter sharing included). Its never-called
``sconv2`` parameters (dead weight in the reference) are NOT replicated.

PSP's AdaptiveAvgPool2d is realized as separable averaging-matrix einsums
(MXU work, no gathers) — see ``adaptive_avg_pool``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu.models.layers import batch_norm, conv
from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    resize_bilinear_align_corners)


@lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix with torch AdaptiveAvgPool2d bin edges."""
    A = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        A[i, start:end] = 1.0 / (end - start)
    return A


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    Ah = jnp.asarray(_adaptive_pool_matrix(x.shape[1], out_h))
    Aw = jnp.asarray(_adaptive_pool_matrix(x.shape[2], out_w))
    y = jnp.einsum("ph,bhwc->bpwc", Ah, x.astype(jnp.float32))
    y = jnp.einsum("qw,bpwc->bpqc", Aw, y)
    return y.astype(x.dtype)


class ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, self.stride, self.padding,
                 self.dilation, self.groups, name="conv1")(x)
        x = batch_norm(name="bn", axis_name=self.bn_axis_name)(
            x, use_running_average=not train)
        return nn.relu(x)


class SeparableConv(nn.Module):
    """dw conv + BN [+ pw conv + BN + ReLU] (fastscnn.py:39-50)."""

    mid: int
    out: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        ura = not train
        x = conv(self.mid, 3, 2, 1, groups=self.mid, name="dw")(x)
        x = batch_norm(name="dw_bn", axis_name=self.bn_axis_name)(
            x, use_running_average=ura)
        x = conv(self.out, 1, name="pw")(x)
        x = batch_norm(name="pw_bn", axis_name=self.bn_axis_name)(
            x, use_running_average=ura)
        return nn.relu(x)


class InvertedResidual(nn.Module):
    """fastscnn.py:83-122 (SAME-padded convs, no fixed_padding here)."""

    inp: int
    oup: int
    stride: int
    expand_ratio: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        hidden = round(self.inp * self.expand_ratio)
        use_res = self.stride == 1 and self.inp == self.oup
        ura = not train
        norm = lambda n: batch_norm(name=n, axis_name=self.bn_axis_name)
        y = x
        if self.expand_ratio != 1:
            y = conv(hidden, 1, name="pw_expand")(y)
            y = nn.relu(norm("bn_expand")(y, use_running_average=ura))
        y = conv(hidden, 3, self.stride, 1, groups=hidden, name="dw")(y)
        y = nn.relu(norm("bn_dw")(y, use_running_average=ura))
        y = conv(self.oup, 1, name="pw_linear")(y)
        y = norm("bn_linear")(y, use_running_average=ura)
        return x + y if use_res else y


class PSPModule(nn.Module):
    """fastscnn.py:126-146: pyramid adaptive pools + 1x1 bottleneck."""

    out_features: int = 128
    sizes: tuple = (1, 2, 3, 6)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[1], x.shape[2]
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool(x, size, size)
            p = conv(x.shape[-1], 1, name=f"stage_{i}")(p)
            priors.append(resize_bilinear_align_corners(p, h, w))
        priors.append(x)
        y = conv(self.out_features, 1, bias=True,
                 name="bottleneck")(jnp.concatenate(priors, -1))
        return nn.relu(y)


class FastSCNN(nn.Module):
    input_channels: int = 3
    num_classes: int = 19
    bn_axis_name: Optional[str] = None

    model_name: str = "fastscnn"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 use_dropout: Optional[bool] = None,
                 return_features: bool = False,
                 noisy_features: bool = False):
        ax = self.bn_axis_name
        h, w = x.shape[1], x.shape[2]

        # learning to downsample (fastscnn.py:34-56)
        y = ConvBlock(32, bn_axis_name=ax, name="ltd_conv1")(x, train)
        y = SeparableConv(32, 48, ax, name="ltd_sconv1")(y, train)
        shared = SeparableConv(48, 64, ax, name="ltd_sconv2")(y, train)

        # global feature extractor (fastscnn.py:59-79)
        y = shared
        for i, (inp, oup, s) in enumerate(
                [(64, 64, 2), (64, 64, 1), (64, 64, 1),
                 (64, 96, 2), (96, 96, 1), (96, 96, 1),
                 (96, 128, 1), (128, 128, 1), (128, 128, 1)]):
            y = InvertedResidual(inp, oup, s, 6, ax,
                                 name=f"gfe_block_{i}")(y, train)
        y = PSPModule(128, bn_axis_name=ax, name="ppm")(y, train)

        # feature fusion (fastscnn.py:149-166)
        low = resize_bilinear_align_corners(y, y.shape[1] * 4, y.shape[2] * 4)
        low = ConvBlock(128, stride=1, groups=128, bn_axis_name=ax,
                        name="ff_sconv1")(low, train)
        low = conv(128, 1, bias=True, name="ff_conv_low")(low)
        high = conv(128, 1, bias=True, name="ff_conv_high")(shared)
        y = nn.relu(high + low)

        # classifier (fastscnn.py:169-180) — sconv1 applied twice, verbatim
        clf = ConvBlock(128, stride=1, groups=128, bn_axis_name=ax,
                        name="clf_sconv1")
        y = clf(y, train)
        y = clf(y, train)
        y = conv(self.num_classes, 1, bias=True, name="clf_conv")(y)
        return resize_bilinear_align_corners(y, h, w)
