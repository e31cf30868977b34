"""Region-level selection geometry: box-filter scoring, square NMS, masks.

Parity targets:
* box-sum score map — reference active_selection/mc_dropout.py:148-149
  (conv2d of the entropy map with an all-ones region_size^2 kernel, VALID);
  implemented here as two separable `lax.reduce_window` sums (O(H*W*k)
  instead of O(H*W*k^2), exact same result up to f32 summation order).
* greedy square NMS — mc_dropout.py:82-108. The reference re-runs a full
  argmax over the whole (N, S, S) stack per selected box; since each
  iteration only modifies ONE image's map, we keep a per-image running max
  and only rescan the modified image — identical selection order (first-
  occurrence tie-breaking preserved), ~O(N + S^2) per box instead of
  O(N*S^2).
* labeled-region suppression — mc_dropout.py:110-121: zero already-labeled
  boxes in the entropy map before scoring.
"""

from __future__ import annotations

import math
from functools import partial as _partial
from typing import Dict, List, Sequence, Tuple

import jax as _jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Region = Tuple[int, int, int, int]  # (row, col, height, width)


def box_sum_valid(maps: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """(B, H, W) -> (B, H-k+1, W-k+1) all-ones box filter, VALID padding."""
    x = maps.astype(jnp.float32)[..., None]
    x = lax.reduce_window(x, 0.0, lax.add, (1, kernel, 1, 1), (1, 1, 1, 1), "VALID")
    x = lax.reduce_window(x, 0.0, lax.add, (1, 1, kernel, 1), (1, 1, 1, 1), "VALID")
    return x[..., 0]


def region_mask(shape: Tuple[int, int], regions: Sequence[Region]) -> np.ndarray:
    """Boolean mask that is True inside any of the given (r, c, h, w) boxes."""
    mask = np.zeros(shape, dtype=bool)
    for (r, c, h, w) in regions or ():
        mask[r: r + h, c: c + w] = True
    return mask


def suppression_multiplier(shape: Tuple[int, int],
                           regions: Sequence[Region]) -> np.ndarray:
    """1.0 outside labeled boxes, 0.0 inside (ref suppress_labeled_entropy)."""
    return (~region_mask(shape, regions)).astype(np.float32)


def square_nms(score_maps: np.ndarray, region_size: int,
               max_selection_count: float,
               stop_threshold: float = 0.01) -> Tuple[List[List[Region]], int]:
    """Greedy square NMS over a stack of score maps.

    Matches reference mc_dropout.py:82-108: pick the global argmax, record a
    (r, c, region, region) box for that image, zero a 2*region-size
    neighbourhood in that image only, stop early once the global max drops
    below ``stop_threshold`` (checked AFTER each selection).
    """
    score_maps = np.ascontiguousarray(score_maps, dtype=np.float32)
    n, S1, S2 = score_maps.shape
    selected: List[List[Region]] = [[] for _ in range(n)]
    # Per-image running max + flat argmax (first occurrence, as torch argmax).
    flat = score_maps.reshape(n, -1)
    per_image_arg = flat.argmax(axis=1)
    per_image_max = flat[np.arange(n), per_image_arg]

    selection_count = 0
    for _ in range(math.ceil(max_selection_count)):
        i = int(per_image_max.argmax())  # first occurrence on ties == flat argmax
        a = int(per_image_arg[i])
        r, c = a // S2, a % S2
        selected[i].append((r, c, region_size, region_size))
        selection_count += 1
        r0, c0 = max(0, r - region_size), max(0, c - region_size)
        r1, c1 = min(S1, r + region_size), min(S2, c + region_size)
        score_maps[i, r0:r1, c0:c1] = 0.0
        per_image_arg[i] = int(flat[i].argmax())
        per_image_max[i] = flat[i, per_image_arg[i]]
        if per_image_max.max() < stop_threshold:
            break

    return selected, selection_count


def _square_nms_device(score_maps: jnp.ndarray, region_size: int,
                       max_count: int, stop_threshold: float,
                       limit=None):
    """Greedy square NMS fully ON DEVICE (lax.while_loop): same selection
    semantics as ``square_nms`` above — global first-occurrence argmax,
    zero the 2*region_size neighbourhood in the picked image only, stop
    once the global max drops below ``stop_threshold`` (checked AFTER each
    selection) — but only the (max_count, 3) box list ever crosses to the
    host. At canonical Cityscapes region geometry the host variant first
    pulls ~1.7 GB of box maps over the wire; this pulls kilobytes.

    The incremental state is the host rewrite's (per-image running
    max/argmax), so each iteration rescans one (S1, S2) map, not the
    whole stack. Bit-equal to ``square_nms`` on the same f32 maps
    (identical elementwise math and tie-breaking; asserted in
    tests/test_scoring_ops.py).

    ``max_count`` sizes the box buffer and is STATIC (a compile key);
    ``limit`` is the DYNAMIC number of boxes actually requested
    (<= max_count, defaults to max_count). Callers bucket max_count up
    (region_pipeline) so that per-round changes in the requested count
    reuse one compiled while_loop instead of recompiling the full
    (N, S, S) program every AL round.

    Returns (boxes (max_count, 3) int32 rows of (image, r, c), count).
    """
    N, S1, S2 = score_maps.shape
    R = region_size
    limit = jnp.int32(max_count if limit is None else limit)
    rows = jnp.arange(S1)
    cols = jnp.arange(S2)
    flat = score_maps.reshape(N, -1)
    parg = jnp.argmax(flat, axis=1).astype(jnp.int32)
    pmax = jnp.take_along_axis(flat, parg[:, None].astype(jnp.int32),
                               axis=1)[:, 0]
    boxes = jnp.zeros((max_count, 3), jnp.int32)

    def cond(state):
        k, _, _, _, _, done = state
        return (k < limit) & ~done

    def body(state):
        k, maps, pmax, parg, boxes, _ = state
        i = jnp.argmax(pmax).astype(jnp.int32)   # first image on ties
        a = parg[i]
        r, c = a // S2, a % S2
        boxes = boxes.at[k].set(jnp.stack([i, r, c]).astype(jnp.int32))
        # zero rows/cols [x - R, x + R) clipped — square_nms's geometry
        window = ((rows >= r - R) & (rows < r + R))[:, None] \
            & ((cols >= c - R) & (cols < c + R))[None, :]
        img = jnp.where(window, 0.0, lax.dynamic_index_in_dim(
            maps, i, axis=0, keepdims=False))
        maps = lax.dynamic_update_index_in_dim(maps, img, i, 0)
        fi = img.reshape(-1)
        ai = jnp.argmax(fi).astype(jnp.int32)
        pmax = pmax.at[i].set(fi[ai])
        parg = parg.at[i].set(ai)
        done = jnp.max(pmax) < stop_threshold
        return k + 1, maps, pmax, parg, boxes, done

    k, _, _, _, boxes, _ = lax.while_loop(
        cond, body,
        (jnp.int32(0), score_maps.astype(jnp.float32), pmax, parg, boxes,
         jnp.bool_(False)))
    return boxes, k


square_nms_device = _partial(
    _jax.jit, static_argnames=("region_size", "max_count",
                               "stop_threshold"))(_square_nms_device)


def device_boxes_to_regions(boxes: np.ndarray, count: int, num_images: int,
                            region_size: int) -> Tuple[List[List[Region]], int]:
    """(max_count, 3) device NMS output -> square_nms's per-image lists."""
    selected: List[List[Region]] = [[] for _ in range(num_images)]
    for i, r, c in np.asarray(boxes)[:count]:
        selected[int(i)].append((int(r), int(c), region_size, region_size))
    return selected, int(count)


def num_requested_regions(selection_size: int, base_size: int,
                          region_size: int) -> float:
    """Reference mc_dropout.py:157: pixel-budget to box-count conversion."""
    return (selection_size * base_size * base_size) / (region_size * region_size)


def regions_to_dict(images: Sequence, selected: List[List[Region]]) -> Dict:
    """mc_dropout.py:164-167: keep only images that received boxes."""
    return {images[i]: regs for i, regs in enumerate(selected) if regs}
