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

    def visualize_image_with_unet(self, writer, dataset, image, target_0,
                                  output_0, target_1, output_1, global_step):
        image = np.asarray(image)[:3]
        writer.add_image("Image", _grid(_unnormalize(image)), global_step)
        pred0 = np.argmax(np.asarray(output_0)[:3], axis=-1).astype(np.uint8)
        writer.add_image("Predicted label",
                         _grid(map_segmentations_to_colors(pred0, dataset)),
                         global_step)
        writer.add_image("Groundtruth label",
                         _grid(map_segmentations_to_colors(
                             np.asarray(target_0)[:3].astype(np.uint8),
                             dataset)), global_step)
        pred1 = np.argmax(np.asarray(output_1)[:3], axis=-1).astype(np.uint8)
        writer.add_image("Predicted Accuracy",
                         _grid(map_segmentations_to_colors(pred1, "binary")),
                         global_step)
        writer.add_image("Groundtruth Accuracy",
                         _grid(map_segmentations_to_colors(
                             np.asarray(target_1)[:3].astype(np.uint8),
                             "binary")), global_step)

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
