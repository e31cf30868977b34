"""Tensorboard summaries (parity: reference utils/summaries.py:11-67).

Same writer factory, scalar tag schema and image panels (Image /
Prediction / Groundtruth grids, two-headed variants, PNG folder dump),
operating on NHWC numpy/jax arrays. tensorboardX is optional: without it a
JSONL scalar writer keeps the schema (tag, value, step) so headless runs
still log everything.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from deep_active_semantic_segmentation_tpu.data.colormaps import (
    map_segmentation_to_colors, map_segmentations_to_colors)
from deep_active_semantic_segmentation_tpu.data.transforms import (
    IMAGENET_MEAN, IMAGENET_STD)

try:
    from tensorboardX import SummaryWriter

    HAVE_TBX = True
except Exception:  # pragma: no cover
    HAVE_TBX = False


class JsonlWriter:
    """Fallback scalar/image writer with the tensorboard API subset used."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": float(step)}) + "\n")
        self._f.flush()

    def add_image(self, tag, img, step):
        pass

    def close(self):
        self._f.close()


def _unnormalize(images_nhwc: np.ndarray) -> np.ndarray:
    x = np.asarray(images_nhwc)
    if x.dtype == np.uint8:  # uint8 device-normalize wire: raw pixels
        return x.astype(np.float32) / 255.0
    return np.clip(x * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN), 0, 1)


def _grid(images_nhwc: np.ndarray) -> np.ndarray:
    """Horizontal grid, CHW float in [0,1] (torchvision make_grid analog)."""
    imgs = [np.asarray(im) for im in images_nhwc]
    row = np.concatenate(imgs, axis=1)
    return np.transpose(row, (2, 0, 1))


class TensorboardSummary:
    def __init__(self, directory):
        self.directory = directory

    def create_summary(self):
        if HAVE_TBX:
            return SummaryWriter(log_dir=self.directory)
        return JsonlWriter(self.directory)

    def visualize_image(self, writer, dataset, image, target, output,
                        global_step, prefix="val"):
        """image (B,H,W,C) normalized; target (B,H,W); output (B,H,W,C) logits."""
        image = np.asarray(image)[:3]
        target = np.asarray(target)[:3]
        output = np.asarray(output)[:3]
        pred = np.argmax(output, axis=-1) if output.ndim == 4 else output
        writer.add_image(f"{prefix}/Image", _grid(_unnormalize(image)),
                         global_step)
        writer.add_image(f"{prefix}/Prediction",
                         _grid(map_segmentations_to_colors(
                             pred.astype(np.uint8), dataset)), global_step)
        writer.add_image(f"{prefix}/Groundtruth",
                         _grid(map_segmentations_to_colors(
                             target.astype(np.uint8), dataset)), global_step)

    def create_single_visualization(self, writer, name, dataset, image,
                                    target_0, output_0, target_1, output_1,
                                    global_step):
        """Two-headed grid (reference utils/summaries.py:45-58, the panel
        its dual-head trainer actually emits — accuracy_predictor_train.py
        :133 per train epoch, :474 per AL round): for each of the first 3
        samples, a 2x3 tile [image | seg pred | acc pred] over
        [zeros | seg gt | acc gt]. (The reference also defines an uncalled
        ``visualize_image_with_unet`` twin, summaries.py:30 — dropped here
        rather than mirrored dead.) Outputs may be class maps (B,H,W) or
        logits (B,H,W,C)."""
        image = np.asarray(image)
        out0, out1 = np.asarray(output_0), np.asarray(output_1)
        if out0.ndim == 4:
            out0 = np.argmax(out0, axis=-1)
        if out1.ndim == 4:
            out1 = np.argmax(out1, axis=-1)
        for k in range(min(3, image.shape[0])):
            img = _unnormalize(image[k])
            seg_pred = map_segmentation_to_colors(
                out0[k].astype(np.uint8), dataset)
            acc_pred = map_segmentation_to_colors(
                out1[k].astype(np.uint8), "binary")
            seg_gt = map_segmentation_to_colors(
                np.asarray(target_0)[k].astype(np.uint8), dataset)
            acc_gt = map_segmentation_to_colors(
                np.asarray(target_1)[k].astype(np.uint8), "binary")
            top = np.concatenate([img, seg_pred, acc_pred], axis=1)
            bottom = np.concatenate([np.zeros_like(seg_gt), seg_gt, acc_gt],
                                    axis=1)
            tile = np.concatenate([top, bottom], axis=0)
            writer.add_image(f"{name}/accuracy_predictions_{k}",
                             np.transpose(tile, (2, 0, 1)), global_step)

    @staticmethod
    def visualize_images_to_folder(output_folder, batch_idx, image, target,
                                   output, dataset):
        """PNG dump (summaries.py:60-67); image NHWC normalized, output
        (B,H,W) predicted classes."""
        os.makedirs(output_folder, exist_ok=True)
        image = np.asarray(image)
        for i in range(image.shape[0]):
            outpath = os.path.join(output_folder, "{0}_{1:04d}_{2:02d}.png")
            rgb = (_unnormalize(image[i:i + 1])[0] * 255).astype(np.uint8)
            Image.fromarray(rgb).save(outpath.format("img", batch_idx, i))
            tgt = (map_segmentation_to_colors(
                np.asarray(target[i]).astype(np.uint8), dataset) * 255
            ).astype(np.uint8)
            Image.fromarray(tgt).save(outpath.format("tgt", batch_idx, i))
            prd = (map_segmentation_to_colors(
                np.asarray(output[i]).astype(np.uint8), dataset) * 255
            ).astype(np.uint8)
            Image.fromarray(prd).save(outpath.format("prd", batch_idx, i))
