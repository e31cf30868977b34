"""Spatial resampling primitives.

``resize_bilinear_align_corners`` reproduces torch
``F.interpolate(mode='bilinear', align_corners=True)`` — used throughout the
reference model zoo (models/deeplab.py:59, decoder.py:45, unet.py:47-58,
aspp.py:80). ``jax.image.resize`` has no align_corners semantics, so the
resampling is expressed as two separable interpolation-matrix contractions
(einsums): TPU-native — the work lands on the MXU instead of gather units,
and XLA fuses the pair.

``avg_pool2d`` matches torch ``F.avg_pool2d(kernel, stride)`` with VALID
padding (used by the core-set / max-subset feature extractors,
core_set.py:61, max_subset.py:68-110).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int,
                   dtype: str = "float32") -> np.ndarray:
    """Dense (out, in) align-corners linear interpolation matrix."""
    A = np.zeros((out_size, in_size), np.dtype(dtype))
    if out_size == 1 or in_size == 1:
        A[:, 0] = 1.0
        return A
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    low = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    high = np.clip(low + 1, 0, in_size - 1)
    frac = (src - low).astype(A.dtype)
    rows = np.arange(out_size)
    A[rows, low] += 1.0 - frac
    np.add.at(A, (rows, high), frac)
    return A


def _resize_compute_dtype(x: jnp.ndarray):
    """f32 for f32/bf16 inputs (torch-parity path, unchanged); f64 stays
    f64 so x64-mode equivalence tests are not floored by f32 roundoff."""
    return jnp.promote_types(x.dtype, jnp.float32)


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True via separable einsums."""
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    dtype = x.dtype
    dt = _resize_compute_dtype(x)
    Ah = jnp.asarray(_interp_matrix(h, out_h, np.dtype(dt).name))
    Aw = jnp.asarray(_interp_matrix(w, out_w, np.dtype(dt).name))
    y = jnp.einsum("ph,bhwc->bpwc", Ah, x.astype(dt),
                   precision=lax.Precision.HIGHEST)
    y = jnp.einsum("qw,bpwc->bpqc", Aw, y, precision=lax.Precision.HIGHEST)
    return y.astype(dtype)


def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """NHWC average pooling, VALID padding (torch F.avg_pool2d semantics)."""
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID")
    return (summed / float(kernel * kernel)).astype(x.dtype)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC adaptive average pool to 1x1 (torch AdaptiveAvgPool2d((1,1)))."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def max_pool2d(x: jnp.ndarray, kernel: int = 2, stride: int = None) -> jnp.ndarray:
    """NHWC max pooling, VALID padding (torch nn.MaxPool2d(kernel))."""
    stride = stride or kernel
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID")
