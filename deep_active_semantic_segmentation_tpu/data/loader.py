"""NHWC batch iterators with background host->device prefetch.

Replaces torch DataLoader usage (reference dataloaders/__init__.py,
active_train.py:96-99). Batches are numpy ``{'image': (B,H,W,C) float32,
'label': (B,H,W) float32}`` plus ``nvalid`` — the number of real samples in
the batch. Unlike torch's variable-size final batch (which would trigger an
XLA recompile per pool size), final partial batches are padded to the full
batch size with ignore-labeled duplicates and ``nvalid`` lets the consumer
reproduce partial-batch loss/metric semantics exactly.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class Loader:
    """Iterates a pool's ``get_item`` as fixed-shape NHWC batches."""

    def __init__(self, pool, batch_size: int, shuffle: bool = False,
                 seed: Optional[int] = None, pad_final: bool = True):
        self.pool = pool
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pad_final = pad_final
        self._rng = np.random.RandomState(seed if seed is not None else 0)

    def __len__(self):
        n = len(self.pool)
        if self.pad_final:
            return (n + self.batch_size - 1) // self.batch_size
        return n // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        n = len(self.pool)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start: start + self.batch_size]
            if len(idx) < self.batch_size and not self.pad_final:
                return
            samples = [self.pool.get_item(int(i)) for i in idx]
            nvalid = len(samples)
            while len(samples) < self.batch_size:
                pad = dict(samples[0])
                pad["label"] = np.full_like(samples[0]["label"], 255.0)
                samples.append(pad)
            image = np.stack([np.asarray(s["image"], np.float32) for s in samples])
            if image.ndim == 3:  # grayscale -> trailing channel dim
                image = image[..., None]
            label = np.stack([np.asarray(s["label"], np.float32) for s in samples])
            yield {"image": image, "label": label, "nvalid": nvalid}


class PathsLoader:
    """Pool-scoring loader (reference dataloaders/dataset/paths_dataset.py).

    Deterministic order over an explicit path list with the eval transform;
    ``include_labels`` toggles image+label batches vs image-only. The
    hardcoded base_size=512 for crop_size == -1 matches paths_dataset.py:16.
    """

    def __init__(self, store, paths, crop_size: int, batch_size: int,
                 include_labels: bool = False):
        from deep_active_semantic_segmentation_tpu.data import transforms as tr

        self.store = store
        self.paths = list(paths)
        self.batch_size = batch_size
        self.include_labels = include_labels
        self.crop_size = crop_size
        self.base_size = 512
        if crop_size == -1:
            self._scalecrop = tr.ScaleWithPadding(base_size=self.base_size)
            self._scalecrop_image = tr.ScaleWithPaddingImageOnly(base_size=self.base_size)
        else:
            self._scalecrop = tr.FixScaleCrop(crop_size=crop_size)
            self._scalecrop_image = tr.FixScaleCropImageOnly(crop_size=crop_size)
        self._norm = tr.Normalize(mean=tr.IMAGENET_MEAN, std=tr.IMAGENET_STD)
        self._norm_image = tr.NormalizeImageOnly(tr.IMAGENET_MEAN, tr.IMAGENET_STD)

    def __len__(self):
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def _get(self, path: bytes):
        rec = np.asarray(self.store.get(path))
        if self.include_labels:
            return self._norm(self._scalecrop(
                {"image": rec[:, :, 0:3], "label": rec[:, :, 3]}))
        return self._norm_image(self._scalecrop_image(rec[:, :, 0:3]))

    def __iter__(self) -> Iterator[dict]:
        for start in range(0, len(self.paths), self.batch_size):
            chunk = self.paths[start: start + self.batch_size]
            samples = [self._get(p) for p in chunk]
            nvalid = len(samples)
            while len(samples) < self.batch_size:
                samples.append(samples[0])
            if self.include_labels:
                image = np.stack([s["image"] for s in samples]).astype(np.float32)
                label = np.stack([s["label"] for s in samples]).astype(np.float32)
                if nvalid < self.batch_size:
                    label[nvalid:] = 255.0
                yield {"image": image, "label": label, "nvalid": nvalid,
                       "paths": chunk}
            else:
                image = np.stack(samples).astype(np.float32)
                yield {"image": image, "nvalid": nvalid, "paths": chunk}


def prefetch_to_device(iterator, device_put_fn, depth: int = 2):
    """Double-buffered host->device pipeline: a producer thread applies
    ``device_put_fn`` (typically a sharded jax.device_put) ``depth`` batches
    ahead of the consumer, overlapping host transform + transfer with device
    compute — the TPU analog of the reference's DataLoader worker prefetch.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err = []

    def producer():
        try:
            for item in iterator:
                q.put(device_put_fn(item))
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
