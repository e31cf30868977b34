"""Torch -> flax weight conversion.

The reference initializes backbones from torch checkpoints
(models/backbone/mobilenet.py:146-157 pulls mobilenet_v2-6a65762b.pth,
resnet.py:147-157 pulls resnet50-19c8e357.pth). This module maps any
reference-layout ``state_dict`` (a file on disk — downloads are
impossible on the zero-egress host — or an in-memory dict) onto our flax
parameter / batch-stats trees.

Conversion rules:
* conv weights (O, I, kh, kw) -> (kh, kw, I, O); the same transpose
  covers depthwise convs ((C, 1, kh, kw) -> (kh, kw, 1, C) for
  feature_group_count=C);
* BN weight/bias -> scale/bias params; running_mean/var -> batch_stats.

Because the mapping covers every layer, the unit tests use it to check
full-network numerical parity: a randomly-initialized reference torch
model and our flax model produce the same logits once weights are copied.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# MobileNetV2 inverted-residual stack: block index -> expand_ratio==1?
_MOBILENET_EXPAND1 = {0}  # first block has t=1 (mobilenet.py:93)


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _set(tree: Dict, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value)


def _bn(params: Dict, stats: Dict, flax_path, sd: Dict, torch_prefix: str):
    _set(params, flax_path + ("scale",), sd[torch_prefix + ".weight"])
    _set(params, flax_path + ("bias",), sd[torch_prefix + ".bias"])
    _set(stats, flax_path + ("mean",), sd[torch_prefix + ".running_mean"])
    _set(stats, flax_path + ("var",), sd[torch_prefix + ".running_var"])


def _conv_p(params: Dict, flax_path, sd: Dict, torch_key: str,
            bias_key: str = None):
    _set(params, flax_path + ("kernel",), _conv(sd[torch_key]))
    if bias_key and bias_key in sd:
        _set(params, flax_path + ("bias",), sd[bias_key])


def mobilenet_state_dict_to_flax(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference mobilenet layout (features.N.*) -> our backbone tree."""
    p: Dict = {}
    s: Dict = {}
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    _conv_p(p, ("stem_conv",), sd, "features.0.0.weight")
    _bn(p, s, ("stem_bn",), sd, "features.0.1")
    # 17 inverted-residual blocks at features.1..17
    for i in range(17):
        t = f"features.{i + 1}.conv"
        b = (f"block_{i}",)
        if i in _MOBILENET_EXPAND1:
            _conv_p(p, b + ("depthwise_conv",), sd, f"{t}.0.weight")
            _bn(p, s, b + ("depthwise_bn",), sd, f"{t}.1")
            _conv_p(p, b + ("project_conv",), sd, f"{t}.3.weight")
            _bn(p, s, b + ("project_bn",), sd, f"{t}.4")
        else:
            _conv_p(p, b + ("expand_conv",), sd, f"{t}.0.weight")
            _bn(p, s, b + ("expand_bn",), sd, f"{t}.1")
            _conv_p(p, b + ("depthwise_conv",), sd, f"{t}.3.weight")
            _bn(p, s, b + ("depthwise_bn",), sd, f"{t}.4")
            _conv_p(p, b + ("project_conv",), sd, f"{t}.6.weight")
            _bn(p, s, b + ("project_bn",), sd, f"{t}.7")
    return p, s


def resnet_state_dict_to_flax(sd: Dict, layers=(3, 4, 6, 3),
                              prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference/torchvision bottleneck-ResNet layout -> our backbone tree."""
    p: Dict = {}
    s: Dict = {}
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    _conv_p(p, ("conv1",), sd, "conv1.weight")
    _bn(p, s, ("bn1",), sd, "bn1")
    for stage, blocks in enumerate(layers):
        for i in range(blocks):
            t = f"layer{stage + 1}.{i}"
            b = (f"layer{stage + 1}_{i}",)
            for j in (1, 2, 3):
                _conv_p(p, b + (f"conv{j}",), sd, f"{t}.conv{j}.weight")
                _bn(p, s, b + (f"bn{j}",), sd, f"{t}.bn{j}")
            if f"{t}.downsample.0.weight" in sd:
                _conv_p(p, b + ("downsample_conv",), sd,
                        f"{t}.downsample.0.weight")
                _bn(p, s, b + ("downsample_bn",), sd, f"{t}.downsample.1")
    return p, s


def deeplab_state_dict_to_flax(sd: Dict, backbone: str = "mobilenet"
                               ) -> Tuple[Dict, Dict]:
    """Full reference DeepLab state_dict -> (params, batch_stats) trees."""
    if backbone == "mobilenet":
        bp, bs = mobilenet_state_dict_to_flax(sd, prefix="backbone.")
    elif backbone in ("resnet", "resnet101"):
        layers = (3, 4, 6, 3) if backbone == "resnet" else (3, 4, 23, 3)
        bp, bs = resnet_state_dict_to_flax(sd, layers=layers,
                                           prefix="backbone.")
    else:
        raise NotImplementedError(backbone)
    p: Dict = {"backbone": bp}
    s: Dict = {"backbone": bs}

    for i in (1, 2, 3, 4):
        _conv_p(p, ("aspp", f"aspp{i}", "atrous_conv"), sd,
                f"aspp.aspp{i}.atrous_conv.weight")
        _bn(p, s, ("aspp", f"aspp{i}", "bn"), sd, f"aspp.aspp{i}.bn")
    _conv_p(p, ("aspp", "gap_conv"), sd, "aspp.global_average_pool.1.weight")
    _bn(p, s, ("aspp", "gap_bn"), sd, "aspp.bn_global_average_pool")
    _conv_p(p, ("aspp", "conv1"), sd, "aspp.conv1.weight")
    _bn(p, s, ("aspp", "bn1"), sd, "aspp.bn1")

    _conv_p(p, ("decoder", "conv1"), sd, "decoder.conv1.weight")
    _bn(p, s, ("decoder", "bn1"), sd, "decoder.bn1")
    _conv_p(p, ("decoder", "last_conv0"), sd, "decoder.last_conv.0.weight")
    _bn(p, s, ("decoder", "last_bn0"), sd, "decoder.last_conv.1")
    _conv_p(p, ("decoder", "last_conv1"), sd, "decoder.last_conv.3.weight")
    _bn(p, s, ("decoder", "last_bn1"), sd, "decoder.last_conv.4")
    _conv_p(p, ("decoder", "classifier"), sd, "decoder.last_conv.7.weight",
            "decoder.last_conv.7.bias")
    return p, s


def unet_state_dict_to_flax(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference UNet layout (models/unet.py:18-36) -> our tree."""
    p: Dict = {}
    s: Dict = {}
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    names = (["dconv_down1", "dconv_down2", "dconv_down3", "dconv_down4",
              "dconv_up3", "dconv_up2", "dconv_up1"])
    for name in names:
        for j, (c, b) in enumerate([(0, 1), (3, 4)]):
            _conv_p(p, (name, f"conv{j}"), sd, f"{name}.{c}.weight",
                    f"{name}.{c}.bias")
            _bn(p, s, (name, f"bn{j}"), sd, f"{name}.{b}")
    _conv_p(p, ("conv_last",), sd, "conv_last.weight", "conv_last.bias")
    return p, s


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            assert k in dst, f"unknown parameter {k}"
            assert np.shape(dst[k]) == np.shape(v), (
                k, np.shape(dst[k]), np.shape(v))
            dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)


def apply_torch_weights(variables: Dict, params_updates: Dict,
                        stats_updates: Dict) -> Dict:
    """Merge converted trees into a model.init() variables dict (shapes
    validated leaf by leaf). Returns a new variables dict."""
    import jax

    out = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    _merge(out["params"], params_updates)
    _merge(out["batch_stats"], stats_updates)
    return out


def load_torch_checkpoint(path: str) -> Dict:
    """Read a .pth/.pth.tar state_dict with torch (CPU)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    return {k: v.numpy() for k, v in sd.items()}
