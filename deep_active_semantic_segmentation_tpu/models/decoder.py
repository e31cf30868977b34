"""DeepLab-v3+ decoder (parity: reference models/decoder.py:9-60).

Low-level 1x1 -> 48ch, concat with align-corners-upsampled ASPP output
(304ch), two 3x3 convs, Dropout2d(MC_DROPOUT_RATE) before the classifier.
Returns ``(logits, second_to_last_features)`` — the 304-channel concat is
the feature tap used by the core-set / max-subset selectors
(decoder.py:46-48, core_set.py:60-63).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.constants import MC_DROPOUT_RATE
from deep_active_semantic_segmentation_tpu.models.layers import (
    Dropout2d, batch_norm, conv)
from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    resize_bilinear_align_corners)


class Decoder(nn.Module):
    num_classes: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, low_level_feat, train: bool, use_dropout: bool):
        ura = not train
        low = conv(48, 1, name="conv1")(low_level_feat)
        low = batch_norm(name="bn1", axis_name=self.bn_axis_name)(
            low, use_running_average=ura)
        low = nn.relu(low)

        x = resize_bilinear_align_corners(x, low.shape[1], low.shape[2])
        second_to_last = jnp.concatenate([x, low], axis=-1)

        y = conv(256, 3, 1, 1, name="last_conv0")(second_to_last)
        y = batch_norm(name="last_bn0", axis_name=self.bn_axis_name)(
            y, use_running_average=ura)
        y = nn.relu(y)
        y = conv(256, 3, 1, 1, name="last_conv1")(y)
        y = batch_norm(name="last_bn1", axis_name=self.bn_axis_name)(
            y, use_running_average=ura)
        y = nn.relu(y)
        y = Dropout2d(MC_DROPOUT_RATE, name="dropout")(
            y, deterministic=not use_dropout)
        y = conv(self.num_classes, 1, bias=True, name="classifier")(y)
        return y, second_to_last
