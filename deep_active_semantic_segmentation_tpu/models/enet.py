"""ENet (parity: reference models/enet.py:486-664).

Full ENet: initial block (conv + maxpool concat), regular / dilated /
asymmetric bottlenecks, downsampling bottlenecks that keep max-pool argmax
indices, and upsampling bottlenecks that max-unpool with them.

TPU-native notes (SURVEY.md "hard parts" #3): XLA has no native
maxpool-with-indices / unpool. Pooling indices are computed with nine
strided slices of the padded input + a first-occurrence argmax (same
tie-breaking as torch's row-major window scan), and unpooling is a batched
scatter of the pooled values to their stored flat positions — both fuse
into plain XLA ops with no host round-trip. Transposed convs reproduce
torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) via
``lhs_dilation`` convolutions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from deep_active_semantic_segmentation_tpu.models.layers import (
    Dropout2d, batch_norm, conv, feature_noise, torch_kaiming_normal)


def max_pool_with_indices(x: jnp.ndarray, kernel: int = 3, stride: int = 2,
                          padding: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch MaxPool2d(kernel, stride, padding, return_indices=True) — but
    the returned "indices" are the argmax WINDOW-OFFSET selector
    ``k = argmax over the kernel*kernel shifted views`` (int8, row-major
    offset order = torch's in-window scan order), not torch's flat plane
    indices. The selector carries the same information for the matching
    ``max_unpool2x`` and keeps the whole pool/unpool pair scatter- and
    gather-free: XLA:TPU lowers the flat-index formulation (scatter .at[]
    .set + take_along_axis) to sort-based scatters — measured 295 ms of a
    373 ms ENet-512^2 train step on v5e. This pair is pure
    slice/compare/select/reshape.

    The pooled value and selector come from one running first-max
    tournament over the 9 window views (strict ``>`` keeps the
    earliest offset), so gradients route to exactly the first-max
    element (torch semantics), unlike ``jnp.max`` which splits
    cotangents among ties.
    """
    if (kernel, stride, padding) != (3, 2, 1):
        raise ValueError(
            f"max_pool_with_indices implements the ENet geometry "
            f"(kernel=3, stride=2, padding=1) only; got "
            f"{(kernel, stride, padding)}")
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(
            f"ENet requires even input sizes (its MaxUnpool2d(2) doubles "
            f"the pooled grid exactly; the torch reference also fails "
            f"end-to-end at odd sizes) — got {H}x{W}. Use an even "
            f"--crop-size (e.g. 512) with --architecture enet.")
    neg = jnp.asarray(-jnp.inf, x.dtype)
    # Parity decomposition instead of strided slices of a padded plane:
    # x5[b,i,py,j,px,c] = x[b,2i+py,2j+px,c]. The window views below are
    # plain slices/pads of the parity grids, so the BACKWARD is pads +
    # adds + a reshape — XLA lowers strided-slice gradients at this size
    # to chained in-place scatters instead (the 9-deep [258^2,8,16]
    # scatter chain in the old HLO).
    x5 = x.reshape(B, H // 2, 2, W // 2, 2, C)
    G = [[x5[:, :, py, :, px, :] for px in (0, 1)] for py in (0, 1)]

    def shift_r(a):   # row offset dr=0: read x[2r-1] = odd grid at i=r-1
        return jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0)),
                       constant_values=neg)[:, :-1]

    def shift_c(a):   # col offset dc=0: read x[2c-1] = odd grid at j=c-1
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0), (0, 0)),
                       constant_values=neg)[:, :, :-1]

    # offset (dr, dc) reads cell (2r+dr-1, 2c+dc-1); row-major offset order
    vals = [
        shift_r(shift_c(G[1][1])), shift_r(G[1][0]), shift_r(G[1][1]),
        shift_c(G[0][1]),          G[0][0],          G[0][1],
        shift_c(G[1][1]),          G[1][0],          G[1][1],
    ]
    # Running first-max tournament instead of stack(9)+argmax+one-hot-sum:
    # strict ``>`` keeps the earliest-offset winner (== jnp.argmax ties ==
    # torch's in-window scan order), and the backward routes the cotangent
    # through the select chain to exactly that winner — identical
    # semantics, but the (9, B, Ho, Wo, C) stack never materializes (the
    # per-HLO trace showed its relayout copy + iota-argmax costing
    # ~19 ms/step of the ENet MC scan at 512^2).
    pooled = vals[0]
    k = jnp.zeros(pooled.shape, jnp.int8)
    for d in range(1, 9):
        better = vals[d] > pooled
        pooled = jnp.where(better, vals[d], pooled)
        k = jnp.where(better, jnp.int8(d), k)
    return pooled, k


def max_unpool2x(values: jnp.ndarray, selector: jnp.ndarray) -> jnp.ndarray:
    """torch MaxUnpool2d(kernel_size=2) for indices recorded by a 3x3/s2/p1
    pool — scatter-free.

    Window (r, c) with offset d=(dr, dc) wrote its value at plane position
    (2r+dr-1, 2c+dc-1). Grouping targets by row/col parity, each output
    cell has a fixed, tiny set of candidate (window, offset) writers:

      even y, even x: d=(1,1) from (i, j)
      even y, odd  x: d=(1,0) from (i, j+1);   d=(1,2) from (i, j)
      odd  y, even x: d=(0,1) from (i+1, j);   d=(2,1) from (i, j)
      odd  y, odd  x: d=(0,0) from (i+1, j+1); d=(0,2) from (i+1, j);
                      d=(2,0) from (i, j+1);   d=(2,2) from (i, j)

    Collisions resolve to the largest (r, c) writer — torch's CPU unpool
    loops windows in row-major order and the last write wins. The four
    parity planes interleave into the 2x plane with a reshape.

    Gradient note: the FORWARD is bit-exact vs torch, but at write
    collisions the backward differs by design — torch's MaxUnpool2d
    backward gathers by stored index, so every colliding window receives
    the output cotangent, while this masked-where formulation routes the
    cotangent only to the winning (last-written) window and gives losers
    an exact 0. The where-form is the correct subgradient of the forward
    actually computed (losing windows do not influence the output);
    torch's duplicate-cotangent behavior is an artifact of its
    gather-based implementation. Collisions require two adjacent 3x3
    pool windows to argmax the same shared cell, which is rare on real
    activations; training parity is checked at the trajectory level
    (tests/test_convergence_parity.py).
    """
    B, h, w, C = values.shape
    sel = [selector == d for d in range(9)]
    M = [jnp.where(s, values, 0) for s in sel]

    def up(a):      # read from window (i+1, j)
        return jnp.pad(a[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))

    def left(a):    # read from window (i, j+1)
        return jnp.pad(a[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))

    p00 = M[4]
    p01 = jnp.where(left(sel[3]), left(M[3]), M[5])
    p10 = jnp.where(up(sel[1]), up(M[1]), M[7])
    p11 = M[8]
    p11 = jnp.where(left(sel[6]), left(M[6]), p11)
    p11 = jnp.where(up(sel[2]), up(M[2]), p11)
    p11 = jnp.where(up(left(sel[0])), up(left(M[0])), p11)

    top = jnp.stack([p00, p01], axis=3)      # (B, h, w, 2, C)
    bot = jnp.stack([p10, p11], axis=3)
    out = jnp.stack([top, bot], axis=2)      # (B, h, 2, w, 2, C)
    return out.reshape(B, 2 * h, 2 * w, C)


class ConvTranspose2dTorch(nn.Module):
    """torch ConvTranspose2d(kernel, stride=2, padding, output_padding=1)."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_kaiming_normal,
                            (k, k, cin, self.features))
        pad = (k - 1 - p, k - 1 - p + op)
        y = lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=[pad, pad],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def _activation(relu: bool, name: str):
    """ReLU, or a single shared PReLU instance (the reference reuses one
    nn.PReLU across a bottleneck's convolutions, enet.py:136-139)."""
    if relu:
        return nn.relu
    return nn.PReLU(name=name)


class InitialBlock(nn.Module):
    """enet.py:6-74: 13-ch conv stride 2 || 3-ch maxpool, concat, BN, act."""

    out_channels: int = 16
    relu: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        main = conv(self.out_channels - 3, 3, 2, 1, name="main_branch")(x)
        ext = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                                (1, 2, 2, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
        y = jnp.concatenate([main, ext], axis=-1)
        y = batch_norm(name="batch_norm", axis_name=self.bn_axis_name)(
            y, use_running_average=not train)
        return _activation(self.relu, "out_act")(y)


class RegularBottleneck(nn.Module):
    """enet.py:77-215: shortcut + (1x1 -> kxk[/asym] -> 1x1 -> Dropout2d)."""

    channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    padding: int = 0
    dilation: int = 1
    asymmetric: bool = False
    dropout_prob: float = 0.0
    relu: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, use_dropout: bool):
        internal = self.channels // self.internal_ratio
        ura = not train
        act = _activation(self.relu, "act")
        norm = lambda n: batch_norm(name=n, axis_name=self.bn_axis_name)

        ext = conv(internal, 1, name="ext_conv1")(x)
        ext = act(norm("ext_bn1")(ext, use_running_average=ura))
        if self.asymmetric:
            ext = conv(internal, (self.kernel_size, 1), 1,
                       (self.padding, 0), dilation=self.dilation,
                       name="ext_conv2a")(ext)
            ext = act(norm("ext_bn2a")(ext, use_running_average=ura))
            ext = conv(internal, (1, self.kernel_size), 1,
                       (0, self.padding), dilation=self.dilation,
                       name="ext_conv2b")(ext)
            ext = act(norm("ext_bn2b")(ext, use_running_average=ura))
        else:
            ext = conv(internal, self.kernel_size, 1, self.padding,
                       dilation=self.dilation, name="ext_conv2")(ext)
            ext = act(norm("ext_bn2")(ext, use_running_average=ura))
        ext = conv(self.channels, 1, name="ext_conv3")(ext)
        ext = act(norm("ext_bn3")(ext, use_running_average=ura))
        ext = Dropout2d(self.dropout_prob, name="ext_regul")(
            ext, deterministic=not use_dropout)
        return act(x + ext)


class DownsamplingBottleneck(nn.Module):
    """enet.py:218-362: maxpool-with-indices main + strided-conv extension,
    zero channel padding on the main branch.

    ``pre_dropout_only`` / ``precomputed``: everything in this block up to
    its ``ext_regul`` dropout is deterministic given a deterministic input
    (eval-mode BN, no rng), so MC scoring can compute (padded main, pool
    indices, pre-dropout ext) ONCE per batch and replay only
    dropout + merge + PReLU per scan step (see ENet ``prefix_only``).
    Bit-exact: the dropout rng fold keys on the ``ext_regul`` module path,
    which is identical in both call shapes."""

    in_channels: int
    out_channels: int
    internal_ratio: int = 4
    dropout_prob: float = 0.0
    relu: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, use_dropout: bool,
                 pre_dropout_only: bool = False, precomputed=None):
        internal = self.in_channels // self.internal_ratio
        ura = not train
        act = _activation(self.relu, "act")
        norm = lambda n: batch_norm(name=n, axis_name=self.bn_axis_name)

        if precomputed is None:
            main, max_indices = max_pool_with_indices(x, 3, 2, 1)
            ext = conv(internal, 2, 2, 0, name="ext_conv1")(x)
            ext = act(norm("ext_bn1")(ext, use_running_average=ura))
            ext = conv(internal, 3, 1, 1, name="ext_conv2")(ext)
            ext = act(norm("ext_bn2")(ext, use_running_average=ura))
            ext = conv(self.out_channels, 1, name="ext_conv3")(ext)
            ext = act(norm("ext_bn3")(ext, use_running_average=ura))
            pad_ch = self.out_channels - self.in_channels
            main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad_ch)))
            if pre_dropout_only:
                return main, max_indices, ext
        else:
            main, max_indices, ext = precomputed
        ext = Dropout2d(self.dropout_prob, name="ext_regul")(
            ext, deterministic=not use_dropout)
        return act(main + ext), max_indices


class UpsamplingBottleneck(nn.Module):
    """enet.py:365-483: 1x1+unpool main + transposed-conv extension."""

    in_channels: int
    out_channels: int
    internal_ratio: int = 4
    dropout_prob: float = 0.0
    relu: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, max_indices, train: bool, use_dropout: bool):
        internal = self.in_channels // self.internal_ratio
        ura = not train
        act = _activation(self.relu, "act")
        norm = lambda n: batch_norm(name=n, axis_name=self.bn_axis_name)

        main = conv(self.out_channels, 1, name="main_conv1")(x)
        main = norm("main_bn1")(main, use_running_average=ura)
        main = max_unpool2x(main, max_indices)

        ext = conv(internal, 1, name="ext_conv1")(x)
        ext = act(norm("ext_bn1")(ext, use_running_average=ura))
        ext = ConvTranspose2dTorch(internal, 3, 2, 1, 1,
                                   name="ext_tconv2")(ext)
        ext = act(norm("ext_bn2")(ext, use_running_average=ura))
        ext = conv(self.out_channels, 1, name="ext_conv3")(ext)
        ext = act(norm("ext_bn3")(ext, use_running_average=ura))
        ext = Dropout2d(self.dropout_prob, name="ext_regul")(
            ext, deterministic=not use_dropout)
        return act(main + ext)


class ENet(nn.Module):
    num_classes: int = 19
    encoder_relu: bool = False
    decoder_relu: bool = True
    bn_axis_name: Optional[str] = None

    model_name: str = "enet"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 use_dropout: Optional[bool] = None,
                 return_features: bool = False,
                 noisy_features: bool = False,
                 upsample_logits: bool = True,
                 prefix_only: bool = False,
                 prefix_features=None):
        """``upsample_logits=False`` returns the pre-classifier stage-5
        features (B, H/2, W/2, 16) instead of full-resolution logits — the
        MC scoring path consumes them through the fused parity-decomposed
        tconv+argmax (ops/tconv_votes.py), never materializing the
        (B, H, W, C) logits (the DeepLab analogue is decoder-resolution
        logits + the Pallas upsample kernel).

        ``prefix_only`` / ``prefix_features``: the MC-scan deterministic-
        prefix hoist (the ENet analogue of DeepLab's ``backbone_only``/
        ``backbone_features`` protocol). The network's dropout-free prefix
        is the InitialBlock PLUS everything in downsample1_0 up to its
        ext_regul dropout (reference models/enet.py: the p=0.01 Dropout2d
        is stage 1's first rng site; BN runs eval-mode in scoring), so MC
        scoring computes (padded pool main, pool indices, pre-dropout ext)
        once per batch and each scan step replays only
        dropout + merge + PReLU before stage 1's regular bottlenecks.
        Bit-compatible with the monolithic forward: the dropout rng folds
        are module-path based and all module paths are unchanged
        (regression: tests/test_scoring_ops.py)."""
        if use_dropout is None:
            use_dropout = train
        er, dr, ax = self.encoder_relu, self.decoder_relu, self.bn_axis_name

        ds1 = DownsamplingBottleneck(16, 64, dropout_prob=0.01, relu=er,
                                     bn_axis_name=ax, name="downsample1_0")
        if prefix_features is None:
            y = InitialBlock(16, relu=er, bn_axis_name=ax,
                             name="initial_block")(x, train)
            if prefix_only:
                return ds1(y, train, use_dropout, pre_dropout_only=True)
            y, idx1 = ds1(y, train, use_dropout)
        else:
            y, idx1 = ds1(None, train, use_dropout,
                          precomputed=prefix_features)
        for i in range(1, 5):
            y = RegularBottleneck(64, padding=1, dropout_prob=0.01, relu=er,
                                  bn_axis_name=ax,
                                  name=f"regular1_{i}")(y, train, use_dropout)

        y, idx2 = DownsamplingBottleneck(64, 128, dropout_prob=0.1, relu=er,
                                         bn_axis_name=ax,
                                         name="downsample2_0")(y, train, use_dropout)

        def stage23(y, prefix, start):
            specs = [
                dict(name=f"regular{prefix}_{start}", padding=1),
                dict(name=f"dilated{prefix}_{start+1}", dilation=2, padding=2),
                dict(name=f"asymmetric{prefix}_{start+2}", kernel_size=5,
                     padding=2, asymmetric=True),
                dict(name=f"dilated{prefix}_{start+3}", dilation=4, padding=4),
                dict(name=f"regular{prefix}_{start+4}", padding=1),
                dict(name=f"dilated{prefix}_{start+5}", dilation=8, padding=8),
                dict(name=f"asymmetric{prefix}_{start+6}", kernel_size=5,
                     padding=2, asymmetric=True),
                dict(name=f"dilated{prefix}_{start+7}", dilation=16, padding=16),
            ]
            for spec in specs:
                name = spec.pop("name")
                y = RegularBottleneck(128, dropout_prob=0.1, relu=er,
                                      bn_axis_name=ax, name=name,
                                      **spec)(y, train, use_dropout)
            return y

        y = stage23(y, "2", 1)
        y = stage23(y, "3", 0)

        features = y
        if noisy_features:
            y = feature_noise(self.make_rng("noise"), y, 0.5)

        y = UpsamplingBottleneck(128, 64, dropout_prob=0.1, relu=dr,
                                 bn_axis_name=ax,
                                 name="upsample4_0")(y, idx2, train, use_dropout)
        for i in (1, 2):
            y = RegularBottleneck(64, padding=1, dropout_prob=0.1, relu=dr,
                                  bn_axis_name=ax,
                                  name=f"regular4_{i}")(y, train, use_dropout)
        y = UpsamplingBottleneck(64, 16, dropout_prob=0.1, relu=dr,
                                 bn_axis_name=ax,
                                 name="upsample5_0")(y, idx1, train, use_dropout)
        y = RegularBottleneck(16, padding=1, dropout_prob=0.1, relu=dr,
                              bn_axis_name=ax,
                              name="regular5_1")(y, train, use_dropout)
        if upsample_logits:
            y = ConvTranspose2dTorch(self.num_classes, 3, 2, 1, 1,
                                     name="transposed_conv")(y)
        if return_features:
            return y, features
        return y
