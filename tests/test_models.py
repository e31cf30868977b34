"""Model zoo structural parity: output shapes, feature taps, and parameter
counts checked against the actual reference torch models instantiated on CPU
(the reference's own __main__ smoke tests print exactly these quantities,
e.g. models/deeplab.py:148-169, enet.py:667-675)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_semantic_segmentation_tpu.models import build_model, lr_multiplier_tree
from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab

REF = "/root/reference"


def _ref_param_count(build_fn):
    """Instantiate a reference torch model (CPU, no pretrained download)."""
    import torch.utils.model_zoo as model_zoo
    orig = model_zoo.load_url
    model_zoo.load_url = lambda *a, **k: {}  # no-egress: skip weight download
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        model = build_fn()
    finally:
        sys.path.remove(REF)
        model_zoo.load_url = orig
    return sum(p.numel() for p in model.parameters())


def _flax_param_count(params):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))


def _init(model, shape=(1, 65, 65, 3), train=False):
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros(shape, jnp.float32), train=train)
    return variables


def test_deeplab_mobilenet_shapes_and_params():
    model = DeepLab(num_classes=19, backbone="mobilenet", output_stride=16)
    variables = _init(model)
    out = model.apply(variables, jnp.zeros((2, 65, 65, 3)), train=False)
    assert out.shape == (2, 65, 65, 19)
    out, feats = model.apply(variables, jnp.zeros((1, 65, 65, 3)),
                             train=False, return_features=True)
    assert feats.shape[-1] == 304  # decoder.py:46 concat channels

    def build():
        from models.deeplab import DeepLab as TorchDeepLab
        return TorchDeepLab(backbone="mobilenet", output_stride=16,
                            num_classes=19, sync_bn=False, mc_dropout=False,
                            pretrained=False)
    assert _flax_param_count(variables["params"]) == _ref_param_count(build)


def test_deeplab_resnet_param_parity():
    model = DeepLab(num_classes=19, backbone="resnet", output_stride=16)
    variables = _init(model)

    def build():
        from models.deeplab import DeepLab as TorchDeepLab
        return TorchDeepLab(backbone="resnet", output_stride=16,
                            num_classes=19, sync_bn=False, mc_dropout=False,
                            pretrained=False)
    assert _flax_param_count(variables["params"]) == _ref_param_count(build)


def test_unet_param_parity_and_shapes():
    model = build_model("unet", 2, input_channels=3)
    variables = _init(model, (1, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 2)

    def build():
        from models.unet import UNet as TorchUNet
        return TorchUNet(3, 2)
    assert _flax_param_count(variables["params"]) == _ref_param_count(build)


def test_enet_param_parity_and_shapes():
    model = build_model("enet", 19)
    variables = _init(model, (1, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 19)
    out, feats = model.apply(variables, jnp.zeros((1, 64, 64, 3)),
                             train=False, return_features=True)
    assert feats.shape == (1, 8, 8, 128)  # encoder output tap (enet.py:641-644)

    def build():
        from models.enet import ENet as TorchENet
        return TorchENet(num_classes=19, encoder_relu=True, decoder_relu=True)
    assert _flax_param_count(variables["params"]) == _ref_param_count(build)


def test_fastscnn_param_parity_and_shapes():
    model = build_model("fastscnn", 19)
    variables = _init(model, (1, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 19)

    def build():
        from models.fastscnn import FastSCNN as TorchFastSCNN
        return TorchFastSCNN(3, 19)
    # The reference Classifier registers an sconv2 that its forward never
    # uses (fastscnn.py:174,178-179 applies sconv1 twice). Those 1408
    # parameters (128-group 3x3 dw conv + BN) are dead weight we do not
    # replicate; everything reachable matches exactly.
    DEAD_SCONV2_PARAMS = 128 * 9 + 128 * 2
    assert (_flax_param_count(variables["params"])
            == _ref_param_count(build) - DEAD_SCONV2_PARAMS)


def test_accuracy_predictor_two_heads():
    model = build_model("accuracy_predictor", 19, backbone="mobilenet")
    variables = _init(model, (1, 65, 65, 3))
    seg, err = model.apply(variables, jnp.zeros((1, 65, 65, 3)), train=False)
    assert seg.shape == (1, 65, 65, 19)
    assert err.shape == (1, 65, 65, 2)

    def build():
        from models.accuracy_predictor import DeepLabAccuracyPredictor as T
        return T(backbone="mobilenet", output_stride=16, num_classes=19,
                 sync_bn=False, freeze_bn=False, mc_dropout=False)
    # torch ctor always downloads mobilenet weights; count with pretrained
    # disabled via the deeplab param path is not exposed, so compare heads
    # separately: deeplab + unet
    def build_parts():
        from models.deeplab import DeepLab as TorchDeepLab
        from models.unet import UNet as TorchUNet
        import torch.nn as nn

        class Pair(nn.Module):
            def __init__(self):
                super().__init__()
                self.a = TorchDeepLab(backbone="mobilenet", output_stride=16,
                                      num_classes=19, sync_bn=False,
                                      mc_dropout=False, pretrained=False)
                self.b = TorchUNet(3 + 19, 2)
        return Pair()
    assert _flax_param_count(variables["params"]) == _ref_param_count(build_parts)


def test_mc_dropout_stochastic_eval():
    model = DeepLab(num_classes=5, backbone="mobilenet", output_stride=16,
                    mc_dropout=True)
    variables = _init(model, (1, 33, 33, 3))
    x = jnp.ones((1, 33, 33, 3))
    det = model.apply(variables, x, train=False)
    det2 = model.apply(variables, x, train=False)
    assert np.allclose(det, det2)
    s1 = model.apply(variables, x, train=False, use_dropout=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    s2 = model.apply(variables, x, train=False, use_dropout=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(s1, s2)


def test_noisy_features_hook():
    model = DeepLab(num_classes=5, backbone="mobilenet", output_stride=16)
    variables = _init(model, (1, 33, 33, 3))
    x = jnp.ones((1, 33, 33, 3))
    det = model.apply(variables, x, train=False)
    n1 = model.apply(variables, x, train=False, noisy_features=True,
                     rngs={"noise": jax.random.PRNGKey(1)})
    assert not np.allclose(det, n1)


def test_lr_multiplier_tree_deeplab():
    model = DeepLab(num_classes=5, backbone="mobilenet")
    variables = _init(model, (1, 33, 33, 3))
    mults = lr_multiplier_tree(variables["params"], "deeplab")
    flat = jax.tree_util.tree_flatten_with_path(mults)[0]
    for path, m in flat:
        top = path[0].key
        assert m == (10.0 if top in ("aspp", "decoder") else 1.0), path


def test_batch_stats_updated_in_train_mode():
    model = build_model("unet", 2)
    variables = _init(model, (1, 16, 16, 3), train=False)
    x = jnp.ones((2, 16, 16, 3))
    _, updates = model.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(0)},
                             mutable=["batch_stats"])
    before = variables["batch_stats"]["dconv_down1"]["bn0"]["mean"]
    after = updates["batch_stats"]["dconv_down1"]["bn0"]["mean"]
    assert not np.allclose(before, after)


def test_enet_pool_unpool_exact_torch_parity_with_collisions():
    """The scatter-free pool/unpool pair (models/enet.py) must reproduce
    torch MaxPool2d(3,2,1,return_indices=True) + MaxUnpool2d(2) EXACTLY,
    including write-collision resolution (overlapping 3x3 windows can
    select the same cell; torch's CPU loop makes the largest window index
    win). Tie-heavy integer inputs force both ties and collisions."""
    import torch

    from deep_active_semantic_segmentation_tpu.models.enet import (
        max_pool_with_indices, max_unpool2x)

    rng = np.random.RandomState(7)
    for trial in range(30):
        B, H, W, C = (rng.randint(1, 3), 2 * rng.randint(2, 12),
                      2 * rng.randint(2, 12), rng.randint(1, 4))
        x = (rng.randint(0, 3, size=(B, H, W, C)) if trial % 2
             else rng.randn(B, H, W, C)).astype(np.float32)
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        pooled_t, idx_t = torch.nn.functional.max_pool2d(
            xt, 3, 2, 1, return_indices=True)
        vals = torch.from_numpy(rng.randn(*pooled_t.shape).astype(np.float32))
        unp_t = torch.nn.functional.max_unpool2d(
            vals, idx_t, 2, stride=2, padding=0, output_size=(H, W)).numpy()

        pooled_j, k = max_pool_with_indices(jnp.asarray(x), 3, 2, 1)
        assert np.array_equal(np.transpose(pooled_t.numpy(), (0, 2, 3, 1)),
                              np.asarray(pooled_j)), trial
        vals_j = jnp.asarray(np.transpose(vals.numpy(), (0, 2, 3, 1)))
        unp_j = np.transpose(np.asarray(max_unpool2x(vals_j, k)), (0, 3, 1, 2))
        assert np.array_equal(unp_t, unp_j), trial
