"""MobileNetV2 backbone (parity: reference models/backbone/mobilenet.py).

Structure: stem conv_bn(32, stride 2) + inverted-residual stack with the
reference's dilation-for-output-stride rule (mobilenet.py:106-115), low-level
feature split after the first four feature blocks (mobilenet.py:133-134),
optional trailing + low-level MC-dropout (mobilenet.py:125-126,135,142-143).

TPU notes: NHWC; depthwise stages use feature_group_count convs which XLA
maps to efficient depthwise convolutions; the reference's TF-style
``fixed_padding`` (pad-then-VALID) is reproduced exactly — including its
quirk of padding before the 1x1 projection conv in the expanded branch
(mobilenet.py:71-79), which changes spatial arithmetic and must match for
weight-transfer compatibility.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from deep_active_semantic_segmentation_tpu.constants import MC_DROPOUT_RATE
from deep_active_semantic_segmentation_tpu.models.layers import (
    Dropout2d, batch_norm, conv, fixed_padding, relu6)

# t (expand), c (channels), n (repeats), s (stride) — mobilenet.py:91-100
INVERTED_RESIDUAL_SETTING = [
    [1, 16, 1, 1],
    [6, 24, 2, 2],
    [6, 32, 3, 2],
    [6, 64, 4, 2],
    [6, 96, 3, 1],
    [6, 160, 3, 2],
    [6, 320, 1, 1],
]


class InvertedResidual(nn.Module):
    inplanes: int
    outplanes: int
    stride: int
    dilation: int
    expand_ratio: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        hidden_dim = round(self.inplanes * self.expand_ratio)
        use_res = self.stride == 1 and self.inplanes == self.outplanes
        norm = lambda n: batch_norm(name=n, axis_name=self.bn_axis_name)
        ura = not train

        x_pad = fixed_padding(x, 3, self.dilation)
        y = x_pad
        if self.expand_ratio != 1:
            y = conv(hidden_dim, 1, 1, 0, name="expand_conv")(y)
            y = norm("expand_bn")(y, use_running_average=ura)
            y = relu6(y)
        y = conv(hidden_dim, 3, self.stride, 0, dilation=self.dilation,
                 groups=hidden_dim, name="depthwise_conv")(y)
        y = norm("depthwise_bn")(y, use_running_average=ura)
        y = relu6(y)
        y = conv(self.outplanes, 1, 1, 0, name="project_conv")(y)
        y = norm("project_bn")(y, use_running_average=ura)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    input_channels: int = 3
    output_stride: int = 8
    width_mult: float = 1.0
    mc_dropout: bool = False
    bn_axis_name: Optional[str] = None

    def _block_plan(self):
        """Replicates the stride/dilation schedule mobilenet.py:103-123."""
        plan = []
        input_channel = int(32 * self.width_mult)
        current_stride = 2  # stem conv
        rate = 1
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            if current_stride == self.output_stride:
                stride, dilation = 1, rate
                rate *= s
            else:
                stride, dilation = s, 1
                current_stride *= s
            output_channel = int(c * self.width_mult)
            for i in range(n):
                plan.append((input_channel, output_channel,
                             stride if i == 0 else 1, dilation, t))
                input_channel = output_channel
        return plan

    @nn.compact
    def __call__(self, x, train: bool = False, use_dropout: Optional[bool] = None,
                 features_only: bool = False, precomputed=None):
        """``features_only`` returns the PRE-dropout (trailing, low-level)
        features; ``precomputed`` feeds such a pair back in, skipping the
        deterministic stem/blocks and applying only the stochastic
        MC-dropout sites. The Dropout2d module paths (and therefore the
        'dropout' rng folds) are identical either way, so
        hoisted == monolithic bit-for-bit per MC step — the MC scoring
        scan computes the backbone once instead of MC_STEPS times
        (selection/kernels.py)."""
        if use_dropout is None:
            use_dropout = train
        ura = not train

        if precomputed is not None:
            y, low_level_feat = precomputed
        else:
            plan = self._block_plan()

            # stem: conv_bn (mobilenet.py:12-20)
            y = conv(int(32 * self.width_mult), 3, 2, 1, name="stem_conv")(x)
            y = batch_norm(name="stem_bn", axis_name=self.bn_axis_name)(
                y, use_running_average=ura)
            y = relu6(y)

            low_level_feat = None
            for idx, (cin, cout, stride, dilation, t) in enumerate(plan):
                y = InvertedResidual(cin, cout, stride, dilation, t,
                                     self.bn_axis_name, name=f"block_{idx}")(y, train)
                if idx == 2:  # features[0:4] = stem + blocks 0..2 (mobilenet.py:133)
                    low_level_feat = y
        if features_only:
            return y, low_level_feat
        if self.mc_dropout:
            # trailing Dropout2d appended to features (mobilenet.py:125-126)
            y = Dropout2d(MC_DROPOUT_RATE, name="trailing_dropout")(
                y, deterministic=not use_dropout)
            low_level_feat = Dropout2d(MC_DROPOUT_RATE, name="low_level_dropout")(
                low_level_feat, deterministic=not use_dropout)
        return y, low_level_feat
