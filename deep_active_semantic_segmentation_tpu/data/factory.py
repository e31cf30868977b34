"""Dataset/loader factory.

Parity target: reference dataloaders/__init__.py:7-96 ``make_dataloader`` —
same six dataset keys, same return tuple ``(train_set, train_loader,
val_loader, None, num_classes)``.
"""

from __future__ import annotations

import os
from typing import Optional

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.data.pools import (
    CITYSCAPES, PASCAL, ActiveImagePool, ActiveRegionPool, PassivePool)
from deep_active_semantic_segmentation_tpu.data.store import open_store


def _resolve_store(dataset_path: str, split: str):
    """Find ``<split>.db`` (lmdb) or ``<split>/`` (DirectoryStore)."""
    for candidate in (os.path.join(dataset_path, split + ".db"),
                      os.path.join(dataset_path, split)):
        if os.path.exists(candidate):
            return open_store(candidate)
    raise FileNotFoundError(
        f"no store for split '{split}' under {dataset_path}")


def make_dataloader(dataset: str, base_size: int, crop_size: int,
                    batch_size: int, num_workers: int = 0,
                    overfit: bool = False, *, init_set: Optional[str] = None,
                    memory_hog: bool = False, dataset_root: Optional[str] = None,
                    seed: Optional[int] = None,
                    device_normalize: bool = False, **_unused):
    """``device_normalize=True`` (cfg.uint8_wire, the drivers' default)
    ships uint8 images/labels and defers the /255-mean/std normalize to
    the jitted steps — exact f32 math, 4x fewer host->device bytes."""
    from deep_active_semantic_segmentation_tpu.data.loader import Loader

    root = dataset_root or constants.DATASET_ROOT
    family = PASCAL if "pascal" in dataset else CITYSCAPES
    dataset_path = os.path.join(root, family.name)
    seed_dir = os.path.join(dataset_path, "seed_sets")

    train_store = _resolve_store(dataset_path, "train")
    val_store = _resolve_store(dataset_path, "val")

    if dataset in ("cityscapes", "pascal"):
        train_set = PassivePool(family, train_store, base_size, crop_size,
                                "train", overfit, memory_hog,
                                device_normalize)
        val_set = PassivePool(family, val_store, base_size, crop_size,
                              "val", overfit, memory_hog, device_normalize)
    elif dataset.endswith("_image"):
        train_set = ActiveImagePool(family, train_store, base_size, crop_size,
                                    "train", init_set, seed_dir, overfit,
                                    memory_hog, device_normalize)
        val_set = ActiveImagePool(family, val_store, base_size, crop_size,
                                  "val", None, seed_dir, overfit, memory_hog,
                                  device_normalize)
    elif dataset.endswith("_region"):
        train_set = ActiveRegionPool(family, train_store, base_size, crop_size,
                                     "train", init_set, seed_dir, overfit,
                                     memory_hog, device_normalize)
        val_set = ActiveRegionPool(family, val_store, base_size, crop_size,
                                   "val", None, seed_dir, overfit, memory_hog,
                                   device_normalize)
    else:
        raise NotImplementedError(dataset)

    train_loader = Loader(train_set, batch_size, shuffle=True, seed=seed)
    val_loader = Loader(val_set, batch_size, shuffle=False)
    return train_set, train_loader, val_loader, None, train_set.NUM_CLASSES
