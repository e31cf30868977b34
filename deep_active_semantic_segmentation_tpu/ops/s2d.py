"""Space-to-depth packing for full-resolution low-channel stages.

TPU tiles the minor (lane) dimension at 128: a bf16 (B, 512, 512, 32)
activation is padded 4x in VMEM/HBM tiles and its 3x3 convs run at 25%
MXU lane occupancy. Re-expressing the stage on the half grid with 4x the
channels — x_p[i, j, (pi*2+pj)*C + c] = x[2i+pi, 2j+pj, c] — makes the
lane dimension exactly 128 for C=32, removing both the layout padding
waste (elementwise/BN fusions read 4x fewer padded tiles) and the
occupancy waste (convs contract 4C lanes). Measured on the v5e
(tools/exp_s2d_unet.py): the UNet stage-1 conv pair runs 5.52 -> 3.33 ms
bf16 despite the packed kernel doing 4x the MACs (its dense blocks are
3/4 zeros) — effective 7.65 -> 50.8 TFLOP/s.

The packed ops below are numerically equivalent re-expressions (same
multiset of multiply-add terms; only reduction order differs):

* ``pack_kernel3x3``: a SAME-padded 3x3 stride-1 conv at full resolution
  equals a SAME-padded 3x3 conv on the half grid with a (3,3,4Cin,4Cout)
  kernel holding each original tap at the unique (half-offset,
  input-parity) slot its source pixel maps to. For output parity di and
  row tap t in {-1,0,1}: a = di + t, half-row offset a//2, source parity
  a % 2 — a bijection per output parity, so exactly 9 of the 36
  (tap, input-parity) slots per (cin, cout) are non-zero. SAME padding on
  the half grid reproduces full-resolution SAME padding exactly for even
  H, W (full row -1 IS parity-1 half row -1; full row H IS parity-0 half
  row H/2).
* ``pack_kernel1x1``: 1x1 convs act per-pixel, so the packed kernel is
  block-diagonal over the 4 parities.
* ``parity_max``: MaxPool2d(2) windows are exactly the 4 parity copies of
  one half-grid cell, so pooling is an elementwise max over the 4 channel
  blocks (output in normal layout at half resolution).
* ``resize2x_packed``: the align-corners 2x bilinear upsample emitted
  directly in packed layout (even/odd slices of the interpolation
  matrices), skipping the full-resolution intermediate + relayout.

Channel concat in packed layout is NOT a concat op: models/unet.py splits
the following conv by source instead — ``conv(s2d_concat(a, b), K) ==
conv(a, pack(K[:, :, :Ca])) + conv(b, pack(K[:, :, Ca:]))`` — which avoids
the 8-piece interleaved lane-unaligned concatenate entirely.

ODD sizes run packed too, exactly, via a zero-refreshed canvas: the H=513
grid is embedded in a 514 canvas whose extra full-resolution row/col is
(re-)zeroed immediately before every 3x3 conv — a zeroed canvas row IS
the SAME-padding zero row the 513-grid conv would have read, so real
outputs are exact and only the canvas row holds junk. Batch-norm
statistics stay exact by reducing the garbage-masked tensor and scaling
by the static canvas/real pixel-count ratio (zeros add nothing to sum or
sum-of-squares); MaxPool2d's floor drop of the last odd row/col is the
``[:, :H//2, :W//2]`` slice of ``parity_max``; and ``resize_packed``
embeds the real interpolation matrix in the canvas size with a zero last
row/col, so resized tensors arrive with their garbage already zero. 1x1
convs act per-pixel and need no masking.

Used by models/unet.py (reference models/unet.py:18-71 runs the same
stage at full resolution in torch NCHW, where cuDNN has no 128-lane
constraint to dodge).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    _interp_matrix)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), parity blocks pi*2+pj major."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`: (B, H', W', 4C) -> (B, 2H', 2W', C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def pack_kernel3x3(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (3, 3, 4Cin, 4Cout) packed equivalent."""
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    packed = jnp.zeros((3, 3, 4 * cin, 4 * cout), kernel.dtype)
    for di in range(2):
        for dj in range(2):
            po = di * 2 + dj
            for t in range(-1, 2):
                for s in range(-1, 2):
                    ar, ac = di + t, dj + s
                    ur, uc = ar // 2 + 1, ac // 2 + 1   # half-grid tap
                    pi = (ar % 2) * 2 + (ac % 2)        # input parity block
                    packed = packed.at[
                        ur, uc,
                        pi * cin:(pi + 1) * cin,
                        po * cout:(po + 1) * cout].set(kernel[t + 1, s + 1])
    return packed


def pack_kernel1x1(kernel: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, Cin, Cout) HWIO -> (1, 1, 4Cin, 4Cout) block-diagonal."""
    _, _, cin, cout = kernel.shape
    packed = jnp.zeros((1, 1, 4 * cin, 4 * cout), kernel.dtype)
    for p in range(4):
        packed = packed.at[:, :, p * cin:(p + 1) * cin,
                           p * cout:(p + 1) * cout].set(kernel)
    return packed


def tile_features(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (C,) -> packed (4C,) (same value in each block)."""
    return jnp.tile(v, 4)


def parity_max(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(2) of the unpacked tensor, computed in packed layout.

    (B, H', W', 4C) -> (B, H', W', C), normal layout. Static lane slices
    keep the elementwise maxes in the dense packed layout (a reshape to
    (..., 4, C) would re-pad the minor dimension to 128).
    """
    c = x.shape[-1] // 4
    blocks = [x[..., p * c:(p + 1) * c] for p in range(4)]
    return jnp.maximum(jnp.maximum(blocks[0], blocks[1]),
                       jnp.maximum(blocks[2], blocks[3]))


def resize_packed(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """``space_to_depth(pad_to_even(resize_bilinear_align_corners(x, out_h,
    out_w)))`` without materializing the full-resolution intermediate or
    its relayout.

    The resize is two dense interpolation-matrix contractions
    (ops/interpolate.py); the packed output's parity plane (pi, pj) is
    exactly the (even/odd-row, even/odd-col) slice of those matrices, so
    each plane is computed by its own einsum pair at half the output rows.
    Odd targets get a zero row/col appended to the matrix (the canvas
    garbage lane arrives already zero). Every real output element is the
    same HIGHEST-precision dot product as in the unfused path (the backend
    may tile the reduction differently, so equality is to dot-product
    roundoff, not bitwise — tests/test_s2d.py).
    """
    b, h, w, c = x.shape
    dt = jnp.promote_types(x.dtype, jnp.float32)
    ah = _interp_matrix(h, out_h, np.dtype(dt).name)
    aw = _interp_matrix(w, out_w, np.dtype(dt).name)
    if out_h % 2:
        ah = np.concatenate([ah, np.zeros((1, h), ah.dtype)], axis=0)
    if out_w % 2:
        aw = np.concatenate([aw, np.zeros((1, w), aw.dtype)], axis=0)
    x32 = x.astype(dt)
    rows = [jnp.einsum("ih,bhwc->biwc", jnp.asarray(ah[pi::2]), x32,
                       precision=lax.Precision.HIGHEST) for pi in range(2)]
    planes = [jnp.einsum("jw,biwc->bijc", jnp.asarray(aw[pj::2]), rows[pi],
                         precision=lax.Precision.HIGHEST).astype(x.dtype)
              for pi in range(2) for pj in range(2)]
    return jnp.concatenate(planes, axis=-1)


def space_to_depth_canvas(x: jnp.ndarray) -> jnp.ndarray:
    """``space_to_depth`` of x zero-padded to even H, W (no-op pad when
    already even). The appended canvas row/col is zero — exactly the SAME
    padding a conv on the unpadded grid would read."""
    _, h, w, _ = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    return space_to_depth(x)


def canvas_keep_masks(hh: int, ww: int, pad_h: int, pad_w: int, c: int):
    """Factorized (1, hh, 1, 4c) x (1, 1, ww, 4c) f32 keep-masks whose
    product is 0 exactly at the canvas garbage cells (full-resolution row
    2*hh-1 when pad_h, col 2*ww-1 when pad_w) and 1 elsewhere. Multiplying
    a packed canvas tensor by both restores the zero-canvas invariant
    before a 3x3 conv; the broadcast multiplies fuse into the conv's
    prologue."""
    row = np.ones((hh, 4 * c), np.float32)
    col = np.ones((ww, 4 * c), np.float32)
    if pad_h:
        row[hh - 1, 2 * c:4 * c] = 0.0          # parity pi == 1 blocks
    if pad_w:
        col[ww - 1, c:2 * c] = 0.0              # parity pj == 1 blocks
        col[ww - 1, 3 * c:4 * c] = 0.0
    return (jnp.asarray(row)[None, :, None, :],
            jnp.asarray(col)[None, None, :, :])


def apply_canvas_masks(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Zero the canvas garbage cells of a packed tensor (no-op when the
    canvas has no padding)."""
    if not (pad_h or pad_w):
        return x
    b, hh, ww, c4 = x.shape
    row, col = canvas_keep_masks(hh, ww, pad_h, pad_w, c4 // 4)
    return x * row.astype(x.dtype) * col.astype(x.dtype)
