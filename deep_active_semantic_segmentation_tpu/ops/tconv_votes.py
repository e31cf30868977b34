"""Fused 2x transposed-conv classifier + class argmax (learned-upsample
analogue of ops/pallas/upsample_argmax for ENet-style decoders).

ENet's last layer is ConvTranspose2dTorch(num_classes, 3, 2, 1, 1) — the
classifier and the final 2x upsample in one op (reference
models/enet.py:603-607). In the MC scoring loop its logits are consumed
only by an argmax vote, but XLA:TPU lowers conv(lhs_dilation=2)+argmax to
a single catastrophically slow loop fusion: measured 15.6 ms of each
~25 ms MC step on the v5e (bf16, 512^2, batch 8) — 62% of the whole ENet
vote kernel.

This module computes the same votes via the tconv's PARITY DECOMPOSITION:
with k=3, s=2, p=1, op=1, output row 2i reads only kernel row 1 and output
row 2i+1 reads rows {0, 2} from inputs {i, i+1} (same for columns), so the
full-resolution logits split into four quarter-size matmuls:

  out[2i,   2j]   = x[i, j] @ K[1,1]
  out[2i,   2j+1] = x[i, j] @ K[1,0] + x[i, j+1] @ K[1,2]
  out[2i+1, 2j]   = x[i, j] @ K[0,1] + x[i+1, j] @ K[2,1]
  out[2i+1, 2j+1] = x[i, j] @ K[0,0] + x[i, j+1] @ K[0,2]
                  + x[i+1, j] @ K[2,0] + x[i+1, j+1] @ K[2,2]

expressed as ONE ordinary 2x2 stride-1 conv with a repacked
(2, 2, Cin, 4*Cout) kernel — parity p of output pixel (i, j) reads input
taps {(i, j), (i, j+1), (i+1, j), (i+1, j+1)}, which IS a 2x2 conv window
over the bottom/right zero-padded input — followed by a per-parity argmax
and a reshape interleave. The (B, 2h, 2w, C) logits never materialize;
each MC step writes only the (B, 2h, 2w) votes.

(Round-3 shipped the same decomposition as shifted-slice views + one
einsum; the round-4 trace showed the four pad/slice shifts cost
~32 ms/step at 512^2 — 255-row slices fall off the (8,128) tile grid —
plus 19 ms forming the 64-MB stacked tensor. The conv formulation hands
the halo to XLA's native conv lowering: no shifted copies, no stacked
intermediate.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tconv2x_argmax_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: jnp.ndarray = None,
                          lane_pad: int = 32) -> jnp.ndarray:
    """(B, h, w, Cin) features + the ConvTranspose2dTorch(3, 2, 1, 1)
    HWIO kernel -> (B, h, w, 4) class votes in PARITY-PACKED layout
    (last axis = output parity 00, 01, 10, 11; ``interleave_parity``
    restores full resolution). Matching
    ``argmax(ConvTranspose2dTorch(...)(x), -1)`` up to matmul summation
    order in f32 (equality regression-tested in tests/test_scoring_ops.py).

    Two layout optimizations on top of the parity decomposition (round-5,
    from the r4 per-HLO trace):

    * callers that aggregate votes pixelwise (the MC scan) consume the
      packed layout directly and interleave ONCE after the scan — the
      (B, 2h, 2w) strided interleave write cost 7.6 ms of every MC step;
    * per-parity channels are zero-padded to ``lane_pad`` so the conv
      output is 4*lane_pad = 128 lanes — exactly one TPU lane tile —
      instead of 4*19 = 76 (the r4 trace's 4.2 ms relayout); pad
      channels are masked to dtype-min before the argmax, so they can
      never win.

    The MXU accumulates in f32 (``preferred_element_type``) and the
    accumulations are rounded back to the INPUT dtype before the argmax —
    under f32 scoring that is a no-op (exact torch match above); under
    bf16 scoring it reproduces the unfused module's own output rounding
    (torch/flax round the tconv output to bf16 before any argmax). Any
    residual vote flip at near-tie pixels sits inside the bf16-vs-f32
    scoring band already validated for MC voting (BASELINE.md)."""
    B, h, w, C = x.shape
    K = kernel  # (3, 3, Cin, Cout)
    Cout = K.shape[-1]
    Cpad = max(lane_pad, Cout) if (4 * Cout) % 128 else Cout

    z = jnp.zeros_like(K[0, 0])
    # W[di, dj, :, p, :]: the tconv tap feeding output parity p
    # (order 00, 01, 10, 11) from input (i+di, j+dj), per the table above
    W = jnp.stack([
        jnp.stack([jnp.stack([K[1, 1], K[1, 0], K[0, 1], K[0, 0]]),
                   jnp.stack([z,       K[1, 2], z,       K[0, 2]])]),
        jnp.stack([jnp.stack([z,       z,       K[2, 1], K[2, 0]]),
                   jnp.stack([z,       z,       z,       K[2, 2]])]),
    ])                                  # (2, 2, parity, Cin, Cout)
    W = jnp.transpose(W, (0, 1, 3, 2, 4))   # (2, 2, Cin, parity, Cout)
    if Cpad != Cout:
        W = jnp.pad(W, ((0, 0),) * 4 + ((0, Cpad - Cout),))
    W = W.reshape(2, 2, C, 4 * Cpad)

    logits = jax.lax.conv_general_dilated(
        x, W.astype(x.dtype), window_strides=(1, 1),
        padding=((0, 1), (0, 1)),       # bottom/right zero: the tconv's
        dimension_numbers=("NHWC", "HWIO", "NHWC"),  # implicit edge pad
        preferred_element_type=jnp.float32).astype(x.dtype)
    # (micro-benched on v5e at 512^2: reshape-argmax 13-15 ms/call vs a
    # per-parity slice-argmax formulation at 23-29 — the sliced variant
    # defeats XLA's fusion and relayouts 4x; keep the reshape)
    logits = logits.reshape(B, h, w, 4, Cpad)
    if bias is not None:
        bias = bias.astype(logits.dtype)
        if Cpad != Cout:
            bias = jnp.pad(bias, (0, Cpad - Cout))
        logits = logits + bias
    if Cpad != Cout:  # zero-padded channels must never win the argmax
        ch = jax.lax.broadcasted_iota(jnp.int32, (Cpad,), 0)
        logits = jnp.where(ch < Cout, logits,
                           jnp.finfo(logits.dtype).min)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, h, w, 4)


def interleave_parity(packed: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, 4) parity-packed maps (order 00, 01, 10, 11) ->
    (B, 2h, 2w) full-resolution maps. Elementwise-commutes with any
    per-pixel op, so vote counting / entropy can run packed and
    interleave once."""
    B, h, w, _ = packed.shape
    packed = packed.reshape(B, h, w, 2, 2)
    return jnp.transpose(packed, (0, 1, 3, 2, 4)).reshape(B, 2 * h, 2 * w)


def interleave_parity_major(packed: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, h, w) PARITY-MAJOR maps (axis 1 = parity 00, 01, 10, 11, the
    layout of ops/pallas/tconv_votes_fused.py, which keeps w in the lane
    dimension through the MC scan) -> (B, 2h, 2w) full resolution."""
    B, _, h, w = packed.shape
    p = packed.reshape(B, 2, 2, h, w)
    return jnp.transpose(p, (0, 3, 1, 4, 2)).reshape(B, 2 * h, 2 * w)


def tconv2x_argmax(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray = None) -> jnp.ndarray:
    """(B, h, w, Cin) -> (B, 2h, 2w) int32 class votes (full-resolution
    convenience wrapper over the packed kernel above)."""
    return interleave_parity(tconv2x_argmax_packed(x, kernel, bias))


def supports(shape_low, shape_full) -> bool:
    """True when the full-res geometry is the exact 2x of the low-res one."""
    return (shape_full[0] == 2 * shape_low[0]
            and shape_full[1] == 2 * shape_low[1])
