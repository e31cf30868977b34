"""Fused 4x align-corners bilinear upsample + class argmax (Pallas/TPU).

The MC-dropout scoring hot loop (reference mc_dropout.py:39-40: argmax of
the model output per stochastic forward) spends a large share of its HBM
bandwidth materializing the bilinearly upsampled full-resolution logits
(B, 513, 513, C) float32 every step, only to immediately argmax over C.
DeepLab's final upsample is exactly 4x for every FixScaleCrop geometry
(output H = 4*(h-1)+1, e.g. 129 -> 513), so this kernel consumes the
decoder-resolution logits directly and emits int32 class votes — the
(B, H, W, C) f32 intermediate never exists:

  per step   einsum-upsample path: write 4*H*W*C + read 4*H*W*C bytes
             fused path:           read 4*h*w*C + write 4*H*W bytes
             (C=19: ~37x less traffic on the upsample tail)

Layout: channels ride the unrolled leading axis, the image width rides the
lane dimension. Rows are tiled over the grid; the row-pair (j, j+1)
boundary is handled by passing the (row-padded) input twice with block
indices i and i+1 — no manual DMA needed. Interpolation is two chained
lerps (rows then columns), the same association order as the einsum
reference path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TIN = 32  # input row pairs per grid step -> 128 output rows per step


def _kernel(a_ref, b_ref, aw_ref, out_ref):
    # a: (1, C, TIN, w) current row tile; b: same block one tile ahead;
    # aw: (w, W) column-interpolation matrix (2 nonzeros per column)
    a = a_ref[0]
    nxt = jnp.concatenate([a[:, 1:, :], b_ref[0, :, :1, :]], axis=1)
    C, tin, w = a.shape
    W = aw_ref.shape[1]

    # rows pass (VPU): out row 4j+f = (1-f/4)*row_j + (f/4)*row_{j+1}
    row_parts = [a * (1.0 - f / 4.0) + nxt * (f / 4.0) for f in range(4)]
    rows = jnp.stack(row_parts, axis=2).reshape(C * 4 * tin, w)

    # cols pass (MXU): lanes w -> W through the interpolation matrix —
    # interleaving via matmul avoids lane-reshuffling reshapes Mosaic
    # cannot lower
    full = jnp.dot(rows, aw_ref[:, :],
                   preferred_element_type=jnp.float32).reshape(C, 4 * tin, W)

    out_ref[0] = jnp.argmax(full, axis=0).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def upsample4_argmax(logits_low: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, C) f32 -> (B, 4(h-1)+1, 4(w-1)+1) int32 class votes."""
    B, h, w, C = logits_low.shape
    H, W = 4 * (h - 1) + 1, 4 * (w - 1) + 1
    x = jnp.transpose(logits_low.astype(jnp.float32), (0, 3, 1, 2))

    n_tiles = -(-h // TIN)  # pairs j in [0, h-1] need tiles covering j<h
    padded_rows = (n_tiles + 1) * TIN
    x = jnp.pad(x, ((0, 0), (0, 0), (0, padded_rows - h), (0, 0)))

    from deep_active_semantic_segmentation_tpu.ops.interpolate import (
        _interp_matrix)

    aw = jnp.asarray(_interp_matrix(w, W).T)  # (w, W)

    out = pl.pallas_call(
        _kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, C, TIN, w), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, C, TIN, w), lambda b, i: (b, 0, i + 1, 0)),
            pl.BlockSpec((w, W), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4 * TIN, W), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * 4 * TIN, W), jnp.int32),
        # Mosaic needs real TPU hardware; the CPU mesh used by the test
        # suite runs the kernel through the Pallas interpreter instead,
        # keeping selection behavior identical across platforms.
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(x, x, aw)
    return out[:, :H, :]


def supports(shape_low, shape_full) -> bool:
    """True when the full-res geometry is the exact 4x of the low-res one."""
    return (shape_full[0] == 4 * (shape_low[0] - 1) + 1
            and shape_full[1] == 4 * (shape_low[1] - 1) + 1)
