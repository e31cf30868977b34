"""Full-network numerical parity: copy a reference torch model's weights
into our flax models and compare logits on the same input. Exercises every
layer's semantics (padding, dilation, depthwise grouping, BN, resizes) and
validates the pretrained-checkpoint conversion path
(models/pretrained.py)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
from deep_active_semantic_segmentation_tpu.models.pretrained import (
    apply_torch_weights, deeplab_state_dict_to_flax, unet_state_dict_to_flax)
from deep_active_semantic_segmentation_tpu.models.unet import UNet

REF = "/root/reference"


def _ref_model(build_fn):
    import torch.utils.model_zoo as model_zoo
    orig = model_zoo.load_url
    model_zoo.load_url = lambda *a, **k: {}
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        return build_fn()
    finally:
        sys.path.remove(REF)
        model_zoo.load_url = orig


def _np_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_deeplab_mobilenet_forward_parity_with_torch():
    torch.manual_seed(0)

    def build():
        from models.deeplab import DeepLab as TorchDeepLab
        return TorchDeepLab(backbone="mobilenet", output_stride=16,
                            num_classes=7, sync_bn=False, mc_dropout=False,
                            pretrained=False)

    tmodel = _ref_model(build)
    tmodel.eval()

    model = DeepLab(num_classes=7, backbone="mobilenet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 65, 65, 3), jnp.float32), train=False)
    p, s = deeplab_state_dict_to_flax(_np_state_dict(tmodel), "mobilenet")
    variables = apply_torch_weights(variables, p, s)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    ours = np.asarray(model.apply(variables, x, train=False))
    assert np.max(np.abs(ours - ref)) < 2e-3, np.max(np.abs(ours - ref))
    # the scale of logits makes this a tight relative check
    assert np.mean(np.abs(ours - ref)) < 2e-4


def test_deeplab_resnet_forward_parity_with_torch():
    torch.manual_seed(1)

    def build():
        from models.deeplab import DeepLab as TorchDeepLab
        return TorchDeepLab(backbone="resnet", output_stride=16,
                            num_classes=5, sync_bn=False, mc_dropout=False,
                            pretrained=False)

    tmodel = _ref_model(build)
    tmodel.eval()
    model = DeepLab(num_classes=5, backbone="resnet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 65, 65, 3), jnp.float32), train=False)
    p, s = deeplab_state_dict_to_flax(_np_state_dict(tmodel), "resnet")
    variables = apply_torch_weights(variables, p, s)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    ours = np.asarray(model.apply(variables, x, train=False))
    assert np.max(np.abs(ours - ref)) < 2e-3, np.max(np.abs(ours - ref))


def test_enet_forward_parity_with_torch():
    """Also validates the maxpool-argmax / scatter-unpool / transposed-conv
    reimplementations numerically (SURVEY.md hard part #3)."""
    torch.manual_seed(3)

    def build():
        from models.enet import ENet as TorchENet
        return TorchENet(num_classes=6, encoder_relu=True, decoder_relu=True)

    tmodel = _ref_model(build)
    tmodel.eval()
    from deep_active_semantic_segmentation_tpu.models.enet import ENet
    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        enet_state_dict_to_flax)

    model = ENet(num_classes=6, encoder_relu=True, decoder_relu=True)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    p, s = enet_state_dict_to_flax(_np_state_dict(tmodel))
    variables = apply_torch_weights(variables, p, s)

    rng = np.random.RandomState(4)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    ours = np.asarray(model.apply(variables, x, train=False))
    assert np.max(np.abs(ours - ref)) < 1e-4, np.max(np.abs(ours - ref))


def test_fastscnn_forward_parity_with_torch():
    """Also validates adaptive-avg-pool-as-einsum and the PSP pyramid."""
    torch.manual_seed(4)

    def build():
        from models.fastscnn import FastSCNN as TorchFastSCNN
        return TorchFastSCNN(3, 6)

    tmodel = _ref_model(build)
    tmodel.eval()
    from deep_active_semantic_segmentation_tpu.models.fastscnn import FastSCNN
    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        fastscnn_state_dict_to_flax)

    model = FastSCNN(input_channels=3, num_classes=6)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    p, s = fastscnn_state_dict_to_flax(_np_state_dict(tmodel))
    variables = apply_torch_weights(variables, p, s)

    rng = np.random.RandomState(5)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    ours = np.asarray(model.apply(variables, x, train=False))
    assert np.max(np.abs(ours - ref)) < 1e-4, np.max(np.abs(ours - ref))


def test_unet_forward_parity_with_torch():
    torch.manual_seed(2)

    def build():
        from models.unet import UNet as TorchUNet
        return TorchUNet(3, 2)

    tmodel = _ref_model(build)
    tmodel.eval()
    model = UNet(in_channels=3, num_classes=2)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    p, s = unet_state_dict_to_flax(_np_state_dict(tmodel))
    variables = apply_torch_weights(variables, p, s)

    rng = np.random.RandomState(3)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    ours = np.asarray(model.apply(variables, x, train=False))
    assert np.max(np.abs(ours - ref)) < 1e-4, np.max(np.abs(ours - ref))
