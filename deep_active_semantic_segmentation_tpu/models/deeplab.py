"""DeepLab-v3+ (parity: reference models/deeplab.py:11-89).

backbone -> ASPP -> decoder -> align-corners bilinear upsample to input
resolution. Capabilities reproduced as call-time flags instead of the
reference's mutable module state:

* ``return_features`` (deeplab.py:31-32,60-61) — also return the decoder's
  304-channel concat features (core-set / max-subset tap);
* ``noisy_features`` (deeplab.py:34-35,39-56) — additive gaussian noise with
  data-dependent scale at the input (x0.05), backbone outputs (x0.5) and
  ASPP output (x0.5), drawn on device from the 'noise' rng collection;
* ``use_dropout`` — activates every Dropout2d site (the reference's
  turn_on_dropout, mc_dropout.py:175-178); defaults to ``train``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from deep_active_semantic_segmentation_tpu.models.aspp import ASPP
from deep_active_semantic_segmentation_tpu.models.backbone import build_backbone
from deep_active_semantic_segmentation_tpu.models.decoder import Decoder
from deep_active_semantic_segmentation_tpu.models.layers import feature_noise
from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    resize_bilinear_align_corners)


class DeepLab(nn.Module):
    num_classes: int = 19
    backbone: str = "mobilenet"
    output_stride: int = 16
    mc_dropout: bool = False
    input_channels: int = 3
    bn_axis_name: Optional[str] = None

    model_name: str = "deeplab"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 use_dropout: Optional[bool] = None,
                 return_features: bool = False,
                 noisy_features: bool = False,
                 upsample_logits: bool = True,
                 backbone_only: bool = False,
                 backbone_features=None):
        """``backbone_only`` returns the backbone's pre-dropout feature
        pair; ``backbone_features`` feeds such a pair back in, skipping the
        deterministic backbone compute (the dropout rng folds are
        path-based and unchanged, so a hoisted MC forward is bit-identical
        to the monolithic one — see the MC scan in selection/kernels.py).
        Not valid together with ``noisy_features`` (input noise makes the
        backbone stochastic)."""
        if use_dropout is None:
            use_dropout = train

        if noisy_features:
            if backbone_only or backbone_features is not None:
                raise ValueError("backbone hoist is incompatible with "
                                 "noisy_features (stochastic input noise)")
            x = feature_noise(self.make_rng("noise"), x, 0.05)

        bb = build_backbone(self.backbone, self.output_stride, self.mc_dropout,
                            self.input_channels, self.bn_axis_name,
                            name="backbone")
        if backbone_only:
            return bb(x, train=train, use_dropout=use_dropout,
                      features_only=True)
        y, low_level_feat = bb(x, train=train, use_dropout=use_dropout,
                               precomputed=backbone_features)

        if noisy_features:
            y = feature_noise(self.make_rng("noise"), y, 0.5)
            low_level_feat = feature_noise(
                self.make_rng("noise"), low_level_feat, 0.5)

        y = ASPP(self.output_stride, self.bn_axis_name, name="aspp")(
            y, train, use_dropout)

        if noisy_features:
            y = feature_noise(self.make_rng("noise"), y, 0.5)

        low_res_logits, features = Decoder(
            self.num_classes, self.bn_axis_name, name="decoder")(
            y, low_level_feat, train, use_dropout)
        if upsample_logits:
            logits = resize_bilinear_align_corners(
                low_res_logits, x.shape[1], x.shape[2])
        else:
            # decoder-resolution logits — consumed by the fused Pallas
            # upsample+argmax in the MC scoring path (ops/pallas)
            logits = low_res_logits
        if return_features:
            return logits, features
        return logits
