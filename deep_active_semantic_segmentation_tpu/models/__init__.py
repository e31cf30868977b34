"""Flax model zoo (NHWC, cross-replica batch-norm ready).

Parity targets: reference models/ — DeepLab-v3+ (MobileNetV2 / ResNet
backbones, ASPP, decoder with feature tap + MC-dropout sites), ENet,
FastSCNN, UNet, and the two-headed accuracy predictor.
"""

from deep_active_semantic_segmentation_tpu.models.factory import (  # noqa: F401
    build_model, lr_multiplier_tree)
