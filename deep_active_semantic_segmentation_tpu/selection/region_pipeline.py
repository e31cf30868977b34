"""Shared region-map creation pipeline.

Parity: reference active_selection/mc_dropout.py:123-171 (and its clones in
mc_noise.py:151-195, accuracy.py:131-183): per-image score map -> suppress
already-labeled boxes -> all-ones box filter -> global min-max normalize ->
greedy square NMS -> {path: [(r, c, size, size)]}.

TPU design: EVERYTHING stays on device. Per-batch box-sum maps collect as
device chunks (one concatenate builds the (N, S, S) pool tensor), the
global min-max normalization
is elementwise f32 on device, and the inherently-sequential greedy NMS
runs as a lax.while_loop with per-image incremental argmax state
(ops/region.square_nms_device) — only the selected (image, r, c) box list
(kilobytes) ever crosses to the host. The round-2 design shipped the full
(N, S, S) f32 maps to a host NMS: ~1.7 GB per selection round at canonical
Cityscapes geometry (2,975 images, S=385), ~85 s on a 20 MB/s relay link.
A lossy bf16/f16 wire was measured and rejected — rounding provably
reorders the argmax on plateaued box-sum maps (the reference's own
nms_{0,1}.png fixtures change box sequences).

Set DASS_REGION_NMS=host to restore the round-2 streaming host path (the
two are bit-equal — asserted in tests/test_scoring_ops.py — since both
consume identical f32 maps with identical elementwise math).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu.ops import region as region_ops

# Jitted pipeline stages: outside jit every lax op is a separate eager
# dispatch, and on the relay-attached chip dispatch latency dominates —
# the un-jitted per-batch box filter + the elementwise normalize cost
# ~5 s of a 7.6 s region round (200 images) while the same math under
# jit runs in ~0.3 s. One jit per stage, compile-cached across batches
# and AL rounds (static kernel size).


@partial(jax.jit, static_argnames=("kernel",))
def _box_sum(maps, kernel: int):
    return region_ops.box_sum_valid(maps, kernel)


@partial(jax.jit, static_argnames=("kernel",))
def _box_sum_suppressed(maps, mult, kernel: int):
    return region_ops.box_sum_valid(maps * mult, kernel)


@jax.jit
def _minmax_normalize(maps):
    # global min-max normalization (mc_dropout.py:152-155) — exact
    # elementwise f32. Degenerate all-equal maps (fully suppressed /
    # uniform pool) would divide by zero: the reference then emits NaN
    # maps and its NMS spins to max_count on NaN comparisons — here the
    # guard ranks a uniform pool as all-zero so the 0.01 stop fires
    # after one box.
    lo, hi = jnp.min(maps), jnp.max(maps)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
    return (maps - lo) * scale


def create_region_maps_from_scorer(score_batch_fn: Callable, loader,
                                   images: Sequence, existing_regions: List,
                                   region_size: int, selection_size: int,
                                   base_size: int) -> Tuple[Dict, int]:
    """score_batch_fn(batch) -> (B, H, W) device score maps."""
    n = len(images)
    num_requested = region_ops.num_requested_regions(
        selection_size, base_size, region_size)
    # read the knob per call so late env changes behave as documented
    use_device = os.environ.get("DASS_REGION_NMS", "device") == "device"

    # per-batch box maps collected as device chunks and concatenated ONCE:
    # an un-jitted dynamic_update_slice into the (N, S, S) pool buffer
    # would copy the whole buffer every batch (~650 GB of extra HBM
    # traffic per round at canonical 2,975-image geometry)
    chunks = []

    map_ctr = 0
    for batch in loader:
        maps = score_batch_fn(batch)
        nvalid = batch["nvalid"]
        # suppress already-labeled regions (mc_dropout.py:110-121,145);
        # build + upload the multiplier only when this batch actually has
        # labeled boxes — the all-ones map is a no-op and its host->device
        # transfer (B*H*W f32) costs real time on transfer-bound links
        batch_regions = [
            existing_regions[map_ctr + i] if map_ctr + i < n else []
            for i in range(maps.shape[0])]
        if any(batch_regions):
            mult = np.stack([
                region_ops.suppression_multiplier(maps.shape[1:3], regs)
                for regs in batch_regions])
            box = _box_sum_suppressed(maps, jnp.asarray(mult), region_size)
        else:
            box = _box_sum(maps, region_size)  # (B, S, S)
        if nvalid != box.shape[0]:             # pad batch: trailing chunk only
            box = box[:nvalid]
        chunks.append(box if use_device else np.asarray(box))
        map_ctr += nvalid

    requested = int(math.ceil(num_requested))
    if use_device:
        score_maps = jnp.concatenate(chunks, axis=0)
        # normalize (see _minmax_normalize), then the device NMS; the host
        # receives only boxes.
        norm = _minmax_normalize(score_maps)
        # bucket the STATIC box-buffer size to the next power of two
        # (>=256) and pass the requested count as a dynamic limit: per-round
        # variation in requested boxes reuses one compiled while_loop
        # instead of recompiling over the full (N, S, S) stack each round
        bucket = max(256, 1 << (requested - 1).bit_length())
        boxes, count = region_ops.square_nms_device(
            norm, region_size=region_size, max_count=bucket,
            stop_threshold=0.01, limit=requested)
        regions, num_selected = region_ops.device_boxes_to_regions(
            np.asarray(boxes), int(count), n, region_size)
    else:
        score_maps = np.concatenate(chunks, axis=0)
        min_val, max_val = score_maps.min(), score_maps.max()
        scale = 1.0 / (max_val - min_val) if max_val > min_val else 0.0
        score_maps = (score_maps - min_val) * scale
        regions, num_selected = region_ops.square_nms(
            score_maps, region_size, num_requested)
    return region_ops.regions_to_dict(list(images), regions), num_selected
