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


def _tconv(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> our lhs-dilated conv
    kernel (kh, kw, I, O): transpose + spatial flip (the transposed conv is
    a correlation with the 180deg-rotated kernel)."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1, :, :])


def enet_state_dict_to_flax(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference ENet layout (models/enet.py:486-607) -> our tree."""
    p: Dict = {}
    s: Dict = {}
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    _conv_p(p, ("initial_block", "main_branch"), sd,
            "initial_block.main_branch.weight")
    _bn(p, s, ("initial_block", "batch_norm"), sd, "initial_block.batch_norm")

    def regular(name, asymmetric=False):
        base = (name,)
        _conv_p(p, base + ("ext_conv1",), sd, f"{name}.ext_conv1.0.weight")
        _bn(p, s, base + ("ext_bn1",), sd, f"{name}.ext_conv1.1")
        if asymmetric:
            _conv_p(p, base + ("ext_conv2a",), sd, f"{name}.ext_conv2.0.weight")
            _bn(p, s, base + ("ext_bn2a",), sd, f"{name}.ext_conv2.1")
            _conv_p(p, base + ("ext_conv2b",), sd, f"{name}.ext_conv2.3.weight")
            _bn(p, s, base + ("ext_bn2b",), sd, f"{name}.ext_conv2.4")
        else:
            _conv_p(p, base + ("ext_conv2",), sd, f"{name}.ext_conv2.0.weight")
            _bn(p, s, base + ("ext_bn2",), sd, f"{name}.ext_conv2.1")
        _conv_p(p, base + ("ext_conv3",), sd, f"{name}.ext_conv3.0.weight")
        _bn(p, s, base + ("ext_bn3",), sd, f"{name}.ext_conv3.1")

    def downsample(name):
        regular(name)

    def upsample(name):
        base = (name,)
        _conv_p(p, base + ("main_conv1",), sd, f"{name}.main_conv1.0.weight")
        _bn(p, s, base + ("main_bn1",), sd, f"{name}.main_conv1.1")
        _conv_p(p, base + ("ext_conv1",), sd, f"{name}.ext_conv1.0.weight")
        _bn(p, s, base + ("ext_bn1",), sd, f"{name}.ext_conv1.1")
        _set(p, base + ("ext_tconv2", "kernel"),
             _tconv(sd[f"{name}.ext_conv2.0.weight"]))
        _bn(p, s, base + ("ext_bn2",), sd, f"{name}.ext_conv2.1")
        _conv_p(p, base + ("ext_conv3",), sd, f"{name}.ext_conv3.0.weight")
        _bn(p, s, base + ("ext_bn3",), sd, f"{name}.ext_conv3.1")

    downsample("downsample1_0")
    for i in range(1, 5):
        regular(f"regular1_{i}")
    downsample("downsample2_0")
    for prefix23, start in (("2", 1), ("3", 0)):
        regular(f"regular{prefix23}_{start}")
        regular(f"dilated{prefix23}_{start+1}")
        regular(f"asymmetric{prefix23}_{start+2}", asymmetric=True)
        regular(f"dilated{prefix23}_{start+3}")
        regular(f"regular{prefix23}_{start+4}")
        regular(f"dilated{prefix23}_{start+5}")
        regular(f"asymmetric{prefix23}_{start+6}", asymmetric=True)
        regular(f"dilated{prefix23}_{start+7}")
    upsample("upsample4_0")
    regular("regular4_1")
    regular("regular4_2")
    upsample("upsample5_0")
    regular("regular5_1")
    _set(p, ("transposed_conv", "kernel"), _tconv(sd["transposed_conv.weight"]))
    return p, s


def fastscnn_state_dict_to_flax(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference Fast-SCNN layout (models/fastscnn.py:6-194) -> our tree.

    The reference's dead ``classifier.sconv2`` weights are ignored (its
    forward never uses them, fastscnn.py:178-179).
    """
    p: Dict = {}
    s: Dict = {}
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def convblock(flax_name, torch_name):
        _conv_p(p, (flax_name, "conv1"), sd, f"{torch_name}.conv1.weight")
        _bn(p, s, (flax_name, "bn"), sd, f"{torch_name}.bn")

    def sepconv(flax_name, torch_name):
        _conv_p(p, (flax_name, "dw"), sd, f"{torch_name}.0.weight")
        _bn(p, s, (flax_name, "dw_bn"), sd, f"{torch_name}.1")
        _conv_p(p, (flax_name, "pw"), sd, f"{torch_name}.2.weight")
        _bn(p, s, (flax_name, "pw_bn"), sd, f"{torch_name}.3")

    convblock("ltd_conv1", "learning_to_downsample.conv1")
    sepconv("ltd_sconv1", "learning_to_downsample.sconv1")
    sepconv("ltd_sconv2", "learning_to_downsample.sconv2")

    gfe_blocks = ([f"global_feature_extractor.first_block.{i}" for i in range(3)]
                  + [f"global_feature_extractor.second_block.{i}" for i in range(3)]
                  + [f"global_feature_extractor.third_block.{i}" for i in range(3)])
    for idx, t in enumerate(gfe_blocks):
        b = (f"gfe_block_{idx}",)
        _conv_p(p, b + ("pw_expand",), sd, f"{t}.conv.0.weight")
        _bn(p, s, b + ("bn_expand",), sd, f"{t}.conv.1")
        _conv_p(p, b + ("dw",), sd, f"{t}.conv.3.weight")
        _bn(p, s, b + ("bn_dw",), sd, f"{t}.conv.4")
        _conv_p(p, b + ("pw_linear",), sd, f"{t}.conv.6.weight")
        _bn(p, s, b + ("bn_linear",), sd, f"{t}.conv.7")

    for i in range(4):
        _conv_p(p, ("ppm", f"stage_{i}"), sd,
                f"global_feature_extractor.ppm.stages.{i}.1.weight")
    _conv_p(p, ("ppm", "bottleneck"), sd,
            "global_feature_extractor.ppm.bottleneck.weight",
            "global_feature_extractor.ppm.bottleneck.bias")

    convblock("ff_sconv1", "feature_fusion.sconv1")
    _conv_p(p, ("ff_conv_low",), sd, "feature_fusion.conv_low_res.weight",
            "feature_fusion.conv_low_res.bias")
    _conv_p(p, ("ff_conv_high",), sd, "feature_fusion.conv_high_res.weight",
            "feature_fusion.conv_high_res.bias")
    convblock("clf_sconv1", "classifier.sconv1")
    _conv_p(p, ("clf_conv",), sd, "classifier.conv.weight",
            "classifier.conv.bias")
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


def load_backbone_state_dict(path: str) -> Dict:
    """Read a backbone checkpoint: torch ``.pth``/``.pth.tar``, or an
    ``.npz`` holding the same flat torch-named keys (for hosts without a
    torch install the converter CLI can pre-flatten once)."""
    if path.endswith(".npz"):
        return {k: np.asarray(v) for k, v in np.load(path).items()}
    return load_torch_checkpoint(path)


def backbone_weights_from_state_dict(sd: Dict, backbone: str
                                     ) -> Tuple[Dict, Dict]:
    """ImageNet-layout backbone ``state_dict`` -> (params, batch_stats)
    subtrees for our flax backbone.

    Mirrors the reference's default initialization
    (models/backbone/mobilenet.py:130-157 `_load_pretrained_model` pulls
    mobilenet_v2-6a65762b.pth; resnet.py:147-157 pulls
    resnet50-19c8e357.pth): only backbone tensors transplant; the
    checkpoint's ImageNet classifier (and mobilenet's trailing
    ``features.18`` 1x1 conv) is ignored, exactly as the reference's
    key-intersection filter drops it. Accepts the bare torchvision layout
    or a ``backbone.``-prefixed full-model dump.
    """
    prefix = "backbone." if any(k.startswith("backbone.") for k in sd) else ""
    if backbone == "mobilenet":
        return mobilenet_state_dict_to_flax(sd, prefix=prefix)
    if backbone in ("resnet", "resnet50", "resnet101"):
        # depth comes from the checkpoint itself (layer3 block count:
        # 6 -> ResNet50, 23 -> ResNet101); a too-deep checkpoint for a
        # shallower model fails the merge's unknown-parameter assert.
        blocks3 = [int(k[len(prefix) + len("layer3."):].split(".")[0])
                   for k in sd if k.startswith(prefix + "layer3.")]
        if not blocks3:
            raise ValueError("state_dict has no layer3.* keys — not a "
                             "bottleneck-ResNet checkpoint")
        layers = (3, 4, 1 + max(blocks3), 3)
        return resnet_state_dict_to_flax(sd, layers=layers, prefix=prefix)
    raise NotImplementedError(
        f"no pretrained-backbone mapping for '{backbone}'")
