"""Offline dataset converters (parity: reference utils/cityscapes_to_lmdb.py
and utils/pascal_to_lmdb.py).

Write any supported store backend (LMDB when the binding exists — the
reference's exact wire format — or the dependency-free DirectoryStore).
Record format is identical: key = image path, value = HxWx4 uint8
``np.dstack((rgb, label))``; Cityscapes labels remapped 34 -> 19 classes.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path

import numpy as np
from PIL import Image

from deep_active_semantic_segmentation_tpu.data.store import (
    HAVE_LMDB, DirectoryStore, LmdbStore)

CITYSCAPES_IGNORE_INDEX = 255

# reference utils/cityscapes_to_lmdb.py:16-21
CITYSCAPES_VOID_CLASSES = [0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30, -1]
CITYSCAPES_VALID_CLASSES = [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25,
                            26, 27, 28, 31, 32, 33]


def cityscapes_class_map() -> np.ndarray:
    """Dense 256-entry remap table for gtFine labelIds -> trainIds."""
    table = np.full(256, CITYSCAPES_IGNORE_INDEX, np.uint8)
    for train_id, label_id in enumerate(CITYSCAPES_VALID_CLASSES):
        table[label_id] = train_id
    return table


def _make_store(out_path: str, use_lmdb: bool):
    if use_lmdb:
        if not HAVE_LMDB:
            raise RuntimeError("lmdb binding not available; use DirectoryStore")
        return LmdbStore(out_path, readonly=False)
    return DirectoryStore(out_path, readonly=False)


def cityscapes_to_store(root_path: str, split: str, out_path: str,
                        use_lmdb: bool = False) -> int:
    """Convert a Cityscapes split (reference cityscapes_to_lmdb.py:13-58)."""
    images_base = os.path.join(root_path, "leftImg8bit", split)
    labels_base = os.path.join(root_path, "gtFine_trainvaltest", "gtFine", split)
    image_paths = sorted(glob.glob(os.path.join(images_base, "**", "*.png"),
                                   recursive=True))
    table = cityscapes_class_map()
    store = _make_store(out_path, use_lmdb)
    keys = []
    for img_path in image_paths:
        label_path = os.path.join(
            labels_base, Path(img_path).parts[-2],
            f"{os.path.basename(img_path)[:-15]}gtFine_labelIds.png")
        image = np.array(Image.open(img_path).convert("RGB"), np.uint8)
        label = table[np.array(Image.open(label_path), np.uint8)]
        key = "/".join(img_path.replace(root_path, "").split(os.path.sep)
                       ).encode("ascii")
        store.put(key, np.dstack((image, label)))
        keys.append(key)
    store.finalize(keys)
    return len(keys)


def pascal_to_store(root_path: str, split: str, out_path: str,
                    use_lmdb: bool = False) -> int:
    """Convert a Pascal VOC split (reference pascal_to_lmdb.py:11-60)."""
    split_txt = os.path.join(root_path, "ImageSets/Segmentation", f"{split}.txt")
    with open(split_txt, "r") as f:
        names = [x.strip() for x in f.readlines() if x.strip()]
    store = _make_store(out_path, use_lmdb)
    keys = []
    for name in names:
        image = np.array(Image.open(os.path.join(
            root_path, "JPEGImages", f"{name}.jpg")).convert("RGB"), np.uint8)
        label = np.array(Image.open(os.path.join(
            root_path, "SegmentationClassRaw", f"{name}.png")), np.uint8)
        key = name.encode("ascii")
        store.put(key, np.dstack((image, label)))
        keys.append(key)
    store.finalize(keys)
    return len(keys)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="dataset -> store converter")
    parser.add_argument("family", choices=["cityscapes", "pascal"])
    parser.add_argument("root")
    parser.add_argument("split")
    parser.add_argument("out")
    parser.add_argument("--lmdb", action="store_true",
                        help="write the reference's LMDB format")
    ns = parser.parse_args(argv)
    fn = cityscapes_to_store if ns.family == "cityscapes" else pascal_to_store
    n = fn(ns.root, ns.split, ns.out, use_lmdb=ns.lmdb)
    print(f"wrote {n} records to {ns.out}")


if __name__ == "__main__":
    main()
