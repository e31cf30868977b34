"""Two-headed accuracy predictor (parity: reference
models/accuracy_predictor.py:8-42).

Segmentation head (DeepLab or ENet) + error head (UNet over
``concat(softmax(seg_logits), image)``, or a second DeepLab at os8 with
3+C input channels when ``symmetry``). The ``stop_gradient`` reproduces the
reference's ``.detach()`` firewall between heads
(accuracy_predictor.py:26, SURVEY.md section 3.3).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
from deep_active_semantic_segmentation_tpu.models.enet import ENet
from deep_active_semantic_segmentation_tpu.models.unet import UNet


class DeepLabAccuracyPredictor(nn.Module):
    num_classes: int = 19
    backbone: str = "mobilenet"
    output_stride: int = 16
    mc_dropout: bool = False
    enet: bool = False
    symmetry: bool = False
    bn_axis_name: Optional[str] = None
    # space-to-depth packing of the UNet error head's full-res stages
    # (models/unet.py; exact at odd 513^2 via the zero-refreshed canvas)
    use_s2d: bool = True

    model_name: str = "accuracy_predictor"

    def setup(self):
        if not self.enet:
            self.deeplab = DeepLab(num_classes=self.num_classes,
                                   backbone=self.backbone,
                                   output_stride=self.output_stride,
                                   mc_dropout=self.mc_dropout,
                                   bn_axis_name=self.bn_axis_name)
        else:
            self.deeplab = ENet(num_classes=self.num_classes,
                                encoder_relu=True, decoder_relu=True,
                                bn_axis_name=self.bn_axis_name)
        if not self.symmetry:
            self.unet = UNet(in_channels=3 + self.num_classes, num_classes=2,
                             bn_axis_name=self.bn_axis_name,
                             use_s2d=self.use_s2d)
        else:
            self.unet = DeepLab(num_classes=2, backbone=self.backbone,
                                output_stride=8, mc_dropout=False,
                                input_channels=3 + self.num_classes,
                                bn_axis_name=self.bn_axis_name)

    def __call__(self, x, train: bool = False,
                 use_dropout: Optional[bool] = None,
                 unet_only_input: Optional[jnp.ndarray] = None,
                 noisy_features: bool = False):
        if unet_only_input is not None:
            # error-head-only forward, used by the gradient-norm selector
            # (reference accuracy.py:86-90 feeds a detached unet input)
            return self.unet(unet_only_input, train=train,
                             use_dropout=use_dropout)
        seg_logits = self.deeplab(x, train=train, use_dropout=use_dropout,
                                  noisy_features=noisy_features)
        probs = jax.nn.softmax(jax.lax.stop_gradient(seg_logits), axis=-1)
        unet_input = jnp.concatenate([probs, x], axis=-1)
        err_logits = self.unet(unet_input, train=train, use_dropout=use_dropout)
        return seg_logits, err_logits
