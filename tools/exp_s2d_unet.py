"""Pressure-test the 'intrinsic' label on the UNet / dual-head train-step
throughput (round-2 verdict weak #3).

BASELINE.md attributes UNet's 76 imgs/s (and the dual head's 57) to the
full-resolution 32-channel convs running at 25% MXU lane occupancy, and
suggests space-to-depth packing as the standard remedy. This experiment
measures that remedy honestly:

A 3x3 stride-1 conv over (H, W, C) re-expressed in space-to-depth layout
(H/2, W/2, 4C) needs a 3x3 kernel over the half grid with a block-
structured (4C -> 4F) matrix whose blocks are 3/4 ZEROS (each output
parity reads 9 of the 36 tap-channel pairs). The MXU cannot skip zeros,
so the DENSE s2d conv does 4x the FLOPs at (up to) 4x the lane
occupancy — a wash at best when the op is MXU-bound, and a strict loss
when it is HBM-bound (bytes are unchanged). This tool measures:

  1. the full-res conv pair as UNet runs it (3->32, 32->32 @ HxW);
  2. the dense s2d equivalent (12->128, 128->128 @ H/2 x W/2);
  3. the per-HLO breakdown of the whole UNet train step (what actually
     dominates).

Run on the chip: python tools/exp_s2d_unet.py [side] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    key = jax.random.PRNGKey(0)

    @jax.jit
    def fullres_pair(x, k1, k2):
        # UNet dconv_down1 as-is: 3->32 then 32->32 at full res (bf16).
        # Reduce to a scalar on device: fetching the 67 MB activation over
        # the relay link would dominate the timing otherwise.
        y = conv(x, k1)
        return jnp.sum(conv(y, k2), dtype=jnp.float32)

    @jax.jit
    def s2d_pair(x4, k1, k2):
        # dense space-to-depth equivalent: 12->128 then 128->128 at H/2
        y = conv(x4, k1)
        return jnp.sum(conv(y, k2), dtype=jnp.float32)

    dt = jnp.bfloat16
    x = jax.random.normal(key, (batch, side, side, 3), dt)
    k1 = jax.random.normal(key, (3, 3, 3, 32), dt)
    k2 = jax.random.normal(key, (3, 3, 32, 32), dt)
    x4 = jax.random.normal(key, (batch, side // 2, side // 2, 12), dt)
    k1s = jax.random.normal(key, (3, 3, 12, 128), dt)
    k2s = jax.random.normal(key, (3, 3, 128, 128), dt)

    import numpy as np

    def timeit(fn, *args, iters=20):
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / iters * 1000

    ms_full = timeit(fullres_pair, x, k1, k2)
    ms_s2d = timeit(s2d_pair, x4, k1s, k2s)
    flops_full = 2 * batch * side * side * 9 * (3 * 32 + 32 * 32)
    flops_s2d = 2 * batch * (side // 2) ** 2 * 9 * (12 * 128 + 128 * 128)
    print(json.dumps({
        "metric": "s2d_pressure_test",
        "fullres_convpair_ms": round(ms_full, 3),
        "s2d_dense_convpair_ms": round(ms_s2d, 3),
        "s2d_is_faster": bool(ms_s2d < ms_full),
        "fullres_tflops": round(flops_full / ms_full / 1e9, 2),
        "s2d_tflops": round(flops_s2d / ms_s2d / 1e9, 2),
        "note": "s2d does 4x the FLOPs (dense blocks are 3/4 zeros); "
                "a win requires >4x occupancy recovery",
    }))


if __name__ == "__main__":
    main()
