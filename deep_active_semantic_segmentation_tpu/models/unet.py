"""Small 4-level UNet (parity: reference models/unet.py:18-71).

32-64-128-256 double-conv encoder with 2x2 max-pool, bilinear align-corners
skip upsampling with concat, 1x1 classifier, final resize to input size.
Used standalone for SEM binary segmentation and as the error-prediction head
of the two-headed accuracy predictor.

TPU compute path: the full-resolution stages (dconv_down1, dconv_up1,
conv_last) run 32-channel tensors whose minor dimension is 4x-padded to
the 128-lane tile, wasting both HBM traffic (elementwise/BN fusions) and
MXU occupancy (convs contract 32 lanes). When the input height/width are
even, those stages run in space-to-depth packed layout (ops/s2d.py) —
half grid, 4x channels, numerically equivalent term-for-term — and
unpack only at the 2x2 pool (a parity max) and the final logits. The
skip concat is folded into the following conv (split by source) and the
2x skip upsample is emitted directly in packed layout (ops/s2d.py
resize2x_packed), so no full-resolution intermediate or lane-unaligned
concat ever materializes.
Measured on the v5e (tools/bench_hotloops.py unet, 512^2 bs8 bf16): train
step 78.0 -> 104.4 imgs/s (1.34x). The
parameter tree is IDENTICAL to the unpacked path (packed kernels are
built on the fly from the same (3,3,Cin,Cout) params), so checkpoints,
the torch loader (models/pretrained.py) and all parity tests are
unaffected. Odd sizes (e.g. the 513^2 dual-head geometry) run packed
too, exactly, on a zero-refreshed even canvas: the padded row/col is
re-zeroed before every 3x3 conv (zero canvas == SAME-padding zero), BN
statistics are garbage-masked and rescaled by the static canvas/real
pixel-count ratio, and the pool/final slices reproduce torch's floor
semantics (ops/s2d.py module docstring).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax
from flax.linen.dtypes import canonicalize_dtype, promote_dtype

from deep_active_semantic_segmentation_tpu.models.layers import (
    torch_kaiming_normal)
from deep_active_semantic_segmentation_tpu.ops import s2d
from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    max_pool2d, resize_bilinear_align_corners)


class _Conv3x3(nn.Module):
    """3x3 stride-1 pad-1 conv (torch Conv2d semantics, bias), with an
    optional packed apply. Parameter tree ('kernel', 'bias' with the same
    inits) matches models/layers.conv exactly, so trees produced by either
    path are interchangeable.

    In packed mode ``x`` may be a tuple of packed tensors standing for the
    channel concat of their unpacked sources (in order): the conv is split
    by source — ``conv(concat(a, b), K) = conv(a, K[..., :Ca, :]) +
    conv(b, K[..., Ca:, :])`` — so no interleaved packed concat is ever
    materialized (each piece would be lane-unaligned).

    On an odd-size canvas (``canvas`` flags nonzero) each input's garbage
    row/col is re-zeroed first — a zeroed canvas lane IS the SAME-padding
    zero the odd-grid conv would read, so real outputs are exact
    (ops/s2d.py module docstring)."""

    features: int

    @nn.compact
    def __call__(self, x, packed: bool = False, canvas=(0, 0)):
        xs = x if isinstance(x, (tuple, list)) else (x,)
        cins = [t.shape[-1] // (4 if packed else 1) for t in xs]
        kernel = self.param("kernel", torch_kaiming_normal,
                            (3, 3, sum(cins), self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        promoted = promote_dtype(*xs, kernel, bias, dtype=None)
        xs, kernel, bias = promoted[:-2], promoted[-2], promoted[-1]
        if packed:
            bias = s2d.tile_features(bias)
            xs = [s2d.apply_canvas_masks(t, *canvas) for t in xs]
        y, off = None, 0
        for t, cin in zip(xs, cins):
            k = kernel[:, :, off:off + cin, :]
            if packed:
                k = s2d.pack_kernel3x3(k)
            part = lax.conv_general_dilated(
                t, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = part if y is None else y + part
            off += cin
        return y + bias.reshape((1, 1, 1, -1))


class _Conv1x1(nn.Module):
    """1x1 conv with bias (the classifier); packed apply is block-diagonal."""

    features: int

    @nn.compact
    def __call__(self, x, packed: bool = False):
        cin = x.shape[-1] // (4 if packed else 1)
        kernel = self.param("kernel", torch_kaiming_normal,
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        if packed:
            kernel = s2d.pack_kernel1x1(kernel)
            bias = s2d.tile_features(bias)
        y = lax.conv_general_dilated(
            x, kernel, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.reshape((1, 1, 1, -1))


class _BatchNorm(nn.Module):
    """flax nn.BatchNorm semantics (torch momentum 0.9, eps 1e-5, fast
    variance, f32 stats, pmean over axis_name) with an optional packed
    apply: statistics are reduced to (4C,) in the dense packed layout and
    folded to (C,) — the same element multiset as the full-resolution
    reduce — then applied with lane-tiled parameters. Variable tree
    ('scale'/'bias' params, 'mean'/'var' batch_stats, shape (C,))
    matches nn.BatchNorm exactly.

    On an odd-size canvas the statistics reduce the garbage-masked tensor
    and rescale by the static canvas/real pixel-count ratio — zeros add
    nothing to sum or sum-of-squares, so the folded moments equal the
    odd-grid moments exactly. The normalized OUTPUT keeps junk at garbage
    cells; every consumer re-zeros before its conv."""

    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool, packed: bool = False,
                 canvas=(0, 0)):
        groups = 4 if packed else 1
        feat = x.shape[-1] // groups
        scale = self.param("scale", nn.initializers.ones_init(),
                           (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            dt = jnp.promote_types(x.dtype, jnp.float32)
            x32 = x.astype(dt)
            count_scale = 1.0
            if packed and (canvas[0] or canvas[1]):
                x32 = s2d.apply_canvas_masks(x32, *canvas)
                hc, wc = 2 * x.shape[1], 2 * x.shape[2]
                count_scale = (hc * wc) / float(
                    (hc - canvas[0]) * (wc - canvas[1]))
            axes = tuple(range(x.ndim - 1))
            mu = x32.mean(axes)
            mu2 = (x32 * x32).mean(axes)
            if packed:
                mu = mu.reshape(groups, feat).mean(0)
                mu2 = mu2.reshape(groups, feat).mean(0)
            if count_scale != 1.0:
                mu = mu * count_scale
                mu2 = mu2 * count_scale
            if self.axis_name is not None and not self.is_initializing():
                stacked = lax.pmean(jnp.stack([mu, mu2], axis=0),
                                    self.axis_name)
                mu, mu2 = stacked[0], stacked[1]
            var = jnp.maximum(0.0, mu2 - mu * mu)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mu)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
            mean = mu
        out_dtype = canonicalize_dtype(x, scale, bias, dtype=None)
        if packed:
            mean, var = s2d.tile_features(mean), s2d.tile_features(var)
            scale_b, bias_b = s2d.tile_features(scale), s2d.tile_features(bias)
        else:
            scale_b, bias_b = scale, bias
        y = (x - mean) * (lax.rsqrt(var + self.epsilon) * scale_b) + bias_b
        return y.astype(out_dtype)


class DoubleConv(nn.Module):
    features: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, packed: bool = False, canvas=(0, 0)):
        ura = not train
        for i in range(2):
            x = _Conv3x3(self.features, name=f"conv{i}")(x, packed=packed,
                                                         canvas=canvas)
            x = _BatchNorm(name=f"bn{i}", axis_name=self.bn_axis_name)(
                x, use_running_average=ura, packed=packed, canvas=canvas)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 2
    bn_axis_name: Optional[str] = None
    # space-to-depth packing of the full-resolution stages; odd H/W (the
    # 513^2 dual head) run exactly on a zero-refreshed even canvas
    # (ops/s2d.py module docstring)
    use_s2d: bool = True

    model_name: str = "unet"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 use_dropout: Optional[bool] = None,
                 return_features: bool = False,
                 noisy_features: bool = False):
        h, w = x.shape[1], x.shape[2]
        packed = self.use_s2d and h >= 2 and w >= 2
        canvas = (h % 2, w % 2)
        dc = lambda f, n: DoubleConv(f, self.bn_axis_name, name=n)

        if packed:
            conv1 = dc(32, "dconv_down1")(s2d.space_to_depth_canvas(x), train,
                                          packed=True, canvas=canvas)
            # == max_pool2d(unpacked, 2): the slice is torch's floor drop
            # of the last odd row/col (no-op on even canvases)
            y = s2d.parity_max(conv1)[:, :h // 2, :w // 2, :]
        else:
            conv1 = dc(32, "dconv_down1")(x, train)
            y = max_pool2d(conv1, 2)
        conv2 = dc(64, "dconv_down2")(y, train)
        y = max_pool2d(conv2, 2)
        conv3 = dc(128, "dconv_down3")(y, train)
        y = max_pool2d(conv3, 2)
        y = dc(256, "dconv_down4")(y, train)

        y = resize_bilinear_align_corners(y, conv3.shape[1], conv3.shape[2])
        y = dc(128, "dconv_up3")(jnp.concatenate([y, conv3], -1), train)
        y = resize_bilinear_align_corners(y, conv2.shape[1], conv2.shape[2])
        y = dc(64, "dconv_up2")(jnp.concatenate([y, conv2], -1), train)
        if packed:
            y = dc(32, "dconv_up1")((s2d.resize_packed(y, h, w), conv1),
                                    train, packed=True, canvas=canvas)
            out = _Conv1x1(self.num_classes, name="conv_last")(y, packed=True)
            out = s2d.depth_to_space(out)[:, :h, :w, :]
        else:
            y = resize_bilinear_align_corners(y, conv1.shape[1],
                                              conv1.shape[2])
            y = dc(32, "dconv_up1")(jnp.concatenate([y, conv1], -1), train)
            out = _Conv1x1(self.num_classes, name="conv_last")(y)
        return resize_bilinear_align_corners(out, h, w)
