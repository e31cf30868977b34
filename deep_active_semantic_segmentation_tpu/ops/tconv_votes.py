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

expressed as ONE einsum over the four shifted inputs (contraction 4*Cin —
MXU-friendly) followed by a per-parity argmax and a reshape interleave.
The (B, 2h, 2w, C) logits never materialize; each MC step writes only the
(B, 2h, 2w) int32 votes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift_rows(x):
    """x[i+1] with zero padding at the bottom edge (the tconv's implicit
    zero pad: output row 2h-1 reads the nonexistent input row h as 0)."""
    return jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))


def _shift_cols(x):
    return jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))


def tconv2x_argmax(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray = None) -> jnp.ndarray:
    """(B, h, w, Cin) features + the ConvTranspose2dTorch(3, 2, 1, 1)
    HWIO kernel -> (B, 2h, 2w) int32 class votes, matching
    ``argmax(ConvTranspose2dTorch(...)(x), -1)`` up to matmul summation
    order in f32 (equality regression-tested in tests/test_scoring_ops.py).

    Under bf16 scoring the two paths can differ at near-tie pixels: the
    unfused module rounds its OUTPUT logits to bf16 before the argmax,
    while this kernel argmaxes the f32 MXU accumulations directly
    (``preferred_element_type``) — strictly less rounding, so any vote
    flip sits inside the bf16-vs-f32 scoring band already validated for
    MC voting (BASELINE.md; bf16 disagreement-rate test in
    tests/test_scoring_ops.py)."""
    B, h, w, C = x.shape
    K = kernel  # (3, 3, Cin, Cout)
    Cout = K.shape[-1]

    # stacked shifted views: t=0 x[i,j], t=1 x[i,j+1], t=2 x[i+1,j],
    # t=3 x[i+1,j+1]
    xr = _shift_rows(x)
    stacked = jnp.concatenate([x, _shift_cols(x), xr, _shift_cols(xr)],
                              axis=-1)  # (B, h, w, 4*Cin)

    z = jnp.zeros_like(K[0, 0])
    # M[t, parity] per the table above; parity order (00, 01, 10, 11)
    M = jnp.stack([
        jnp.stack([K[1, 1], K[1, 0], K[0, 1], K[0, 0]]),   # t=0: x[i, j]
        jnp.stack([z,       K[1, 2], z,       K[0, 2]]),   # t=1: x[i, j+1]
        jnp.stack([z,       z,       K[2, 1], K[2, 0]]),   # t=2: x[i+1, j]
        jnp.stack([z,       z,       z,       K[2, 2]]),   # t=3: x[i+1,j+1]
    ])                                  # (4, parity, Cin, Cout)
    M = jnp.transpose(M, (0, 2, 1, 3)).reshape(4 * C, 4, Cout)

    logits = jnp.einsum("bhwc,cpd->bhwpd", stacked, M,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    votes = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, h, w, 4)
    votes = votes.reshape(B, h, w, 2, 2)
    return jnp.transpose(votes, (0, 1, 3, 2, 4)).reshape(B, 2 * h, 2 * w)


def supports(shape_low, shape_full) -> bool:
    """True when the full-res geometry is the exact 2x of the low-res one."""
    return (shape_full[0] == 2 * shape_low[0]
            and shape_full[1] == 2 * shape_low[1])
