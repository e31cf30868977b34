"""Model factory + per-parameter LR-multiplier trees.

The reference expresses differential learning rates as optimizer param
groups (deeplab.get_1x_lr_params / get_10x_lr_params, deeplab.py:71-89;
LR_Scheduler groups-1+ x10 rule, lr_scheduler.py:65-72). Functionally that
is a per-leaf multiplier over the parameter pytree: backbone 1x,
aspp + decoder 10x for DeepLab; everything 1x for ENet / FastSCNN / UNet;
per-head composition for the accuracy predictor
(accuracy_predictor.py:30-42).
"""

from __future__ import annotations

from typing import Optional

import jax

from deep_active_semantic_segmentation_tpu.models.accuracy_predictor import (
    DeepLabAccuracyPredictor)
from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
from deep_active_semantic_segmentation_tpu.models.enet import ENet
from deep_active_semantic_segmentation_tpu.models.fastscnn import FastSCNN
from deep_active_semantic_segmentation_tpu.models.unet import UNet


def build_model(architecture: str, num_classes: int, backbone: str = "mobilenet",
                output_stride: int = 16, mc_dropout: bool = False,
                input_channels: int = 3, bn_axis_name: Optional[str] = None,
                enet_head: bool = False, symmetry: bool = False):
    if architecture == "deeplab":
        return DeepLab(num_classes=num_classes, backbone=backbone,
                       output_stride=output_stride, mc_dropout=mc_dropout,
                       input_channels=input_channels,
                       bn_axis_name=bn_axis_name)
    if architecture == "enet":
        return ENet(num_classes=num_classes, encoder_relu=True,
                    decoder_relu=True, bn_axis_name=bn_axis_name)
    if architecture == "fastscnn":
        return FastSCNN(input_channels=input_channels, num_classes=num_classes,
                        bn_axis_name=bn_axis_name)
    if architecture == "unet":
        return UNet(in_channels=input_channels, num_classes=num_classes,
                    bn_axis_name=bn_axis_name)
    if architecture == "accuracy_predictor":
        return DeepLabAccuracyPredictor(num_classes=num_classes,
                                        backbone=backbone,
                                        output_stride=output_stride,
                                        mc_dropout=mc_dropout,
                                        enet=enet_head, symmetry=symmetry,
                                        bn_axis_name=bn_axis_name)
    raise NotImplementedError(architecture)


def lr_multiplier_tree(params, architecture: str, symmetry: bool = False,
                       enet_head: bool = False):
    """Per-leaf LR multipliers matching the reference's param groups."""

    def mult_for_path(path) -> float:
        keys = [p.key for p in path if hasattr(p, "key")]
        if architecture == "deeplab":
            return 10.0 if keys and keys[0] in ("aspp", "decoder") else 1.0
        if architecture == "accuracy_predictor":
            # deeplab head keeps its 1x/10x split unless it's an ENet
            # (accuracy_predictor.py:32-36); symmetric unet head gets the
            # same split (accuracy_predictor.py:37-41).
            if keys and keys[0] == "deeplab" and not enet_head:
                return 10.0 if len(keys) > 1 and keys[1] in ("aspp", "decoder") else 1.0
            if keys and keys[0] == "unet" and symmetry:
                return 10.0 if len(keys) > 1 and keys[1] in ("aspp", "decoder") else 1.0
            return 1.0
        return 1.0

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: mult_for_path(path), params)
