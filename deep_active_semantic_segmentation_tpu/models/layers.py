"""Shared NHWC building blocks with torch-equivalent semantics.

* ``conv`` — flax Conv configured like torch Conv2d (explicit symmetric
  padding, groups, dilation, kaiming-normal init matching torch's
  ``kaiming_normal_`` defaults: fan_in, gain^2=2, untruncated normal).
* ``BatchNorm`` — torch-momentum convention (running = 0.9*running +
  0.1*batch), eps 1e-5. Under pjit with a sharded batch the statistics are
  computed over the GLOBAL batch automatically (XLA inserts the cross-chip
  reductions), which is the TPU-native replacement for the reference's
  models/sync_batchnorm package; an explicit ``axis_name`` is supported for
  shard_map contexts (see parallel/crossreplica.py).
* ``Dropout2d`` — channel dropout (torch nn.Dropout2d): mask broadcast over
  the spatial dims.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

# torch nn.init.kaiming_normal_(w) default: a=0, fan_in, leaky_relu
torch_kaiming_normal = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")


def conv(features: int, kernel: Union[int, Tuple[int, int]], stride: int = 1,
         padding: Union[int, Tuple[int, int]] = 0, dilation: int = 1,
         groups: int = 1, bias: bool = False, name: Optional[str] = None,
         kernel_init=torch_kaiming_normal) -> nn.Conv:
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    return nn.Conv(features, kernel_size=kernel, strides=(stride, stride),
                   padding=pad, kernel_dilation=(dilation, dilation),
                   feature_group_count=groups, use_bias=bias,
                   kernel_init=kernel_init, name=name)


def batch_norm(name: Optional[str] = None,
               axis_name: Optional[str] = None) -> nn.BatchNorm:
    """BatchNorm with torch momentum/eps; weight=1, bias=0 init
    (reference _init_weight blocks, e.g. models/aspp.py:25-34)."""
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis_name=axis_name,
                        use_running_average=None, name=name)


class Dropout2d(nn.Module):
    """Channel dropout (torch nn.Dropout2d) for NHWC tensors."""

    rate: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool):
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2))(
            x, deterministic=deterministic)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def fixed_padding(x: jnp.ndarray, kernel_size: int, dilation: int) -> jnp.ndarray:
    """Reference models/backbone/mobilenet.py:23-30 (TF-style SAME pad)."""
    effective = kernel_size + (kernel_size - 1) * (dilation - 1)
    pad_total = effective - 1
    beg = pad_total // 2
    end = pad_total - beg
    return jnp.pad(x, ((0, 0), (beg, end), (beg, end), (0, 0)))


def feature_noise(rng, x: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Additive gaussian noise with data-dependent scale — the reference's
    noisy-features hook (models/deeplab.py:39-56): sigma = |mean(x)|*factor.
    Computed on device instead of the reference's host numpy round-trip.
    """
    import jax

    scale = jnp.abs(jnp.mean(x)) * factor
    return x + scale * jax.random.normal(rng, x.shape, jnp.float32).astype(x.dtype)
