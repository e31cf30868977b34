"""SEM electron-microscopy binary-segmentation dataset.

Parity target: reference dataloaders/dataset/sem.py:13-67 — grayscale PNG
folders ``sem/<split>/{images,masks}``, FixScaleCrop + flip/blur pipeline,
Normalize(mean=0.4911, std=0.1658), binary float mask. (The only non-LMDB
dataset in the reference; used by the standalone UNet trainer.)
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np
from PIL import Image

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.data import transforms as tr


class SEMData:
    NUM_CLASSES = 2

    def __init__(self, crop_size: int, split: str, dataset_root=None):
        root = dataset_root or constants.DATASET_ROOT
        self.mask_paths = sorted(glob.glob(os.path.join(root, f"sem/{split}/masks/*")))
        self.image_paths = sorted(glob.glob(os.path.join(root, f"sem/{split}/images/*")))
        self.split = split
        self.crop_size = crop_size
        self._scalecrop = tr.FixScaleCrop(crop_size=crop_size)
        self._norm = tr.Normalize(mean=[0.4911], std=[0.1658])
        self._flip = tr.RandomHorizontalFlip()
        self._blur = tr.RandomGaussianBlur()

    def __len__(self):
        return len(self.image_paths)

    def get_item(self, index: int) -> Dict[str, np.ndarray]:
        image = np.array(Image.open(self.image_paths[index]))
        mask = (np.array(Image.open(self.mask_paths[index])) / 255.0)
        # FixScaleCrop needs matched spatial handling for 2D grayscale; the
        # mask is binarized after nearest resize (values stay in {0, 1}).
        sample = {"image": image, "label": (mask * 255).astype(np.uint8)}
        sample = self._scalecrop(sample)
        if self.split == "train":
            sample = self._flip(sample)
            sample = self._blur(sample)
        sample = self._norm(sample)
        sample["label"] = (sample["label"] / 255.0).astype(np.float32)
        img = sample["image"]
        if img.ndim == 2:
            img = img[..., None]
        return {"image": img.astype(np.float32), "label": sample["label"]}
