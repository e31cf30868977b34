"""Backbone factory (parity: reference models/backbone/__init__.py:4-10).

Note the reference's 'resnet' key intentionally builds ResNet-50
(models/backbone/__init__.py:6, resnet.py:149) even though ResNet-101
exists; both are exposed here.
"""

from deep_active_semantic_segmentation_tpu.models.backbone.mobilenet import MobileNetV2
from deep_active_semantic_segmentation_tpu.models.backbone.resnet import (
    ResNet, ResNet50, ResNet101)


def build_backbone(backbone: str, output_stride: int, mc_dropout: bool = False,
                   input_channels: int = 3, bn_axis_name=None, name=None):
    if backbone == "resnet":
        return ResNet(layers=(3, 4, 6, 3), output_stride=output_stride,
                      bn_axis_name=bn_axis_name, name=name)
    if backbone == "resnet101":
        return ResNet(layers=(3, 4, 23, 3), output_stride=output_stride,
                      bn_axis_name=bn_axis_name, name=name)
    if backbone == "mobilenet":
        return MobileNetV2(input_channels=input_channels,
                           output_stride=output_stride, mc_dropout=mc_dropout,
                           bn_axis_name=bn_axis_name, name=name)
    raise NotImplementedError(backbone)
