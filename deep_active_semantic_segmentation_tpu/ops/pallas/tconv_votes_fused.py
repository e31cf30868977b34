"""Fully-fused 2x transposed-conv classifier + per-parity argmax
(Pallas/TPU) — the ENet MC vote tail in one kernel.

ops/tconv_votes.py already reformulates ENet's final
ConvTranspose2dTorch(num_classes, 3, 2, 1, 1) + argmax (reference
models/enet.py:600-654) as ONE 2x2 stride-1 conv over a parity-repacked
kernel with a 128-lane-padded output. The round-5 per-HLO trace of that
path (tools/trace_step.py enet_mc, 512^2 bs8) shows the remaining tail
cost is NOT the conv's FLOPs but its layouts:

  convolution_convert_fusion   12.0 ms/step   (B, h, w, 128) vote conv
  copy.334                      8.1 ms/step   pure relayout {3,0,2,1} ->
                                              {2,3,1,0} feeding the argmax
  iota_reduce_fusion            4.9 ms/step   argmax in a T(4,128) layout
                                              (4-lane tiles: 1/32 utilized)

The argmax reduces over 32-lane groups of the 128-lane conv output, and
XLA can only express that by transposing classes into sublanes — a
~13 ms/step relayout tax, x20 MC steps.

This kernel adopts the layout of ops/pallas/upsample_argmax.py instead:
CLASSES RIDE THE LEADING (sublane) AXIS, the image width rides the lane
dimension, so the per-parity argmax is a leading-axis reduce that Mosaic
lowers to lane-parallel compare-selects — no relayout exists at all. The
2x2 conv becomes one MXU matmul per row tile:

  X64    = [x(i,j) ; x(i,j+1) ; x(i+1,j) ; x(i+1,j+1)]   (4*Cin, rows*w)
  logits = Wt @ X64                                      (4*Cout, rows*w)

with the column taps produced by a shifted-identity matmul (lane shifts
via the MXU, the same trick upsample_argmax uses for interpolation) and
the row taps by the (i, i+1) double-block pattern. Wt is the same parity
tap table as ops/tconv_votes.py (see its module docstring for the
decomposition); votes come out PARITY-MAJOR (B, 4, h, w) — w stays in
lanes through the vote stack, the entropy accumulation, and the one
final interleave (tconv_votes.interleave_parity_major).

Parity with argmax(ConvTranspose2dTorch(...), -1): exact up to matmul
summation order (f32), with the f32 accumulation rounded back to the
input dtype before the argmax exactly like the unfused module's output
rounding (regression tests in tests/test_scoring_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TIN = 32  # input rows per grid step


def _kernel(a_ref, b_ref, wt_ref, s_ref, out_ref, *, n_classes: int):
    # a: (1, Cin, TIN, w) current row tile; b: same block one tile ahead
    # (row halo, exactly like upsample_argmax); wt: (4*Cout, 4*Cin) parity
    # tap table; s: (w, w) shifted identity (column tap j+1, zero at the
    # right edge = the tconv's implicit zero pad)
    # NOTE no reshapes anywhere below: Mosaic's shape-cast support away
    # from 128-multiple lane widths is partial, so every step is a
    # leading-axis concat/slice or a dot_general on the 3-D blocks — the
    # same op set upsample_argmax.py proves out
    a = a_ref[0]
    C, tin, w = a.shape
    nxt = jnp.concatenate([a[:, 1:, :], b_ref[0, :, :1, :]], axis=1)

    pair = jnp.concatenate([a, nxt], axis=0)        # (2C, tin, w): di=0, di=1
    pair_sh = jax.lax.dot_general(                  # dj=1 taps: lane shift
        pair, s_ref[:, :], (((2,), (0,)), ((), ())),  # via the MXU
        preferred_element_type=jnp.float32).astype(pair.dtype)

    # contraction rows in (tap, cin) order; taps 00, 01, 10, 11 to match Wt
    x64 = jnp.concatenate(
        [pair[:C], pair_sh[:C], pair[C:], pair_sh[C:]], axis=0)
    logits = jax.lax.dot_general(                   # (4*Cout, tin, w)
        wt_ref[:, :], x64, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # round the f32 accumulation to the input dtype — the unfused module
    # rounds its conv output before any argmax (ops/tconv_votes.py) —
    # then upcast back to f32 (exact) because Mosaic's argmax lowering
    # only supports f32 operands
    logits = logits.astype(a.dtype).astype(jnp.float32)

    votes = jnp.stack([
        jnp.argmax(logits[p * n_classes:(p + 1) * n_classes], axis=0)
        for p in range(4)
    ])                                              # (4, tin, w); jnp.argmax
    out_ref[0] = votes.astype(jnp.int32)            # keeps first-max ties


def tconv2x_argmax_parity_major(x: jnp.ndarray,
                                kernel: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, Cin) features + the HWIO ConvTranspose2dTorch(3, 2, 1, 1)
    kernel -> (B, 4, h, w) int32 class votes, PARITY-MAJOR (axis 1 =
    output parity 00, 01, 10, 11; ``interleave_parity_major`` restores
    (B, 2h, 2w)). The bias-free form matches the reference's final tconv
    (reference models/enet.py:600-607, bias=False)."""
    B, h, w, C = x.shape
    K = kernel
    Cout = K.shape[-1]

    xt = jnp.transpose(x, (0, 3, 1, 2))             # (B, C, h, w)
    n_tiles = -(-h // TIN)
    padded = (n_tiles + 1) * TIN                    # +1 tile: block i+1 is
    # lane dim to a 128 multiple: Mosaic's dot/shape-cast lowering needs
    # full lane tiles (the production 2x-decoder widths already are); the
    # zero columns reproduce the tconv's right-edge zero pad, and the
    # extra votes are sliced off below
    wp = -(-w // 128) * 128
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, padded - h), (0, wp - w)))

    # Wt[(p, c), (tap, cin)]: the tap feeding output parity p from input
    # offset tap — the same table as ops/tconv_votes.py
    z = jnp.zeros_like(K[0, 0])
    T = jnp.stack([
        jnp.stack([K[1, 1], K[1, 0], K[0, 1], K[0, 0]]),   # tap 00
        jnp.stack([z,       K[1, 2], z,       K[0, 2]]),   # tap 01 (j+1)
        jnp.stack([z,       z,       K[2, 1], K[2, 0]]),   # tap 10 (i+1)
        jnp.stack([z,       z,       z,       K[2, 2]]),   # tap 11
    ])                                  # (tap, parity, Cin, Cout)
    Wt = jnp.transpose(T, (1, 3, 0, 2)).reshape(4 * Cout, 4 * C)
    S = jnp.eye(w, k=-1, dtype=x.dtype)  # S[j+1, j] = 1: column tap j+1

    out = pl.pallas_call(
        partial(_kernel, n_classes=Cout),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, C, TIN, w), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, C, TIN, w), lambda b, i: (b, 0, i + 1, 0)),
            pl.BlockSpec((4 * Cout, 4 * C), lambda b, i: (0, 0)),
            pl.BlockSpec((w, w), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, TIN, w), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 4, n_tiles * TIN, w), jnp.int32),
        # Mosaic needs real TPU hardware; the CPU mesh used by the test
        # suite runs through the Pallas interpreter, keeping selection
        # behavior identical across platforms (as upsample_argmax does).
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xt, xt, Wt.astype(x.dtype), S)
    return out[:, :, :h, :]
