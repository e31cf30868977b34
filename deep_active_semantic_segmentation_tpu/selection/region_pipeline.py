"""Shared region-map creation pipeline.

Parity: reference active_selection/mc_dropout.py:123-171 (and its clones in
mc_noise.py:151-195, accuracy.py:131-183): per-image score map -> suppress
already-labeled boxes -> all-ones box filter -> global min-max normalize ->
greedy square NMS -> {path: [(r, c, size, size)]}.

TPU design: the score maps and box filter stay on device per batch
(separable reduce_window); only the (B, S, S) box-score maps come to the
host (they are needed by the inherently-sequential NMS, which runs with the
incremental-max rewrite in ops/region.py — same selection order, orders of
magnitude fewer scans than the reference's full-stack argmax per box).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from deep_active_semantic_segmentation_tpu.ops import region as region_ops


def create_region_maps_from_scorer(score_batch_fn: Callable, loader,
                                   images: Sequence, existing_regions: List,
                                   region_size: int, selection_size: int,
                                   base_size: int) -> Tuple[Dict, int]:
    """score_batch_fn(batch) -> (B, H, W) device score maps."""
    S = base_size - region_size + 1
    score_maps = np.empty((len(images), S, S), np.float32)
    map_ctr = 0
    for batch in loader:
        maps = score_batch_fn(batch)
        nvalid = batch["nvalid"]
        # suppress already-labeled regions (mc_dropout.py:110-121,145);
        # build + upload the multiplier only when this batch actually has
        # labeled boxes — the all-ones map is a no-op and its host->device
        # transfer (B*H*W f32) costs real time on transfer-bound links
        batch_regions = [
            existing_regions[map_ctr + i] if map_ctr + i < len(images) else []
            for i in range(maps.shape[0])]
        if any(batch_regions):
            mult = np.stack([
                region_ops.suppression_multiplier(maps.shape[1:3], regs)
                for regs in batch_regions])
            maps = maps * jnp.asarray(mult)
        box = region_ops.box_sum_valid(maps, region_size)  # (B, S, S)
        box_host = np.asarray(box)[:nvalid]
        score_maps[map_ctr: map_ctr + nvalid] = box_host
        map_ctr += nvalid

    # global min-max normalization (mc_dropout.py:152-155)
    min_val, max_val = score_maps.min(), score_maps.max()
    score_maps = (score_maps - min_val) * (1.0 / (max_val - min_val))

    num_requested = region_ops.num_requested_regions(
        selection_size, base_size, region_size)
    regions, num_selected = region_ops.square_nms(
        score_maps, region_size, num_requested)
    return region_ops.regions_to_dict(list(images), regions), num_selected
