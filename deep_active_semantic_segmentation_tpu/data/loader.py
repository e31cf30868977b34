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
                pad["label"] = np.full_like(samples[0]["label"], 255)
                samples.append(pad)
            # uint8 wire (pools device_normalize): ship the geometry
            # stages' uint8 pixels/labels untouched — the train/eval
            # steps normalize / cast on device (parallel/steps ingest).
            # Everything else keeps the reference's f32 wire.
            u8 = np.asarray(samples[0]["image"]).dtype == np.uint8
            image = np.stack([np.asarray(s["image"],
                                         np.uint8 if u8 else np.float32)
                              for s in samples])
            if image.ndim == 3:  # grayscale -> trailing channel dim
                image = image[..., None]
            label = np.stack([np.asarray(s["label"],
                                         np.uint8 if u8 else np.float32)
                              for s in samples])
            yield {"image": image, "label": label, "nvalid": nvalid}


class PathsLoader:
    """Pool-scoring loader (reference dataloaders/dataset/paths_dataset.py).

    Deterministic order over an explicit path list with the eval transform;
    ``include_labels`` toggles image+label batches vs image-only. The
    hardcoded base_size=512 for crop_size == -1 matches paths_dataset.py:16.
    """

    def __init__(self, store, paths, crop_size: int, batch_size: int,
                 include_labels: bool = False, device_normalize: bool = False,
                 labels_as_mask: Optional[int] = None):
        from deep_active_semantic_segmentation_tpu.data import transforms as tr

        self.store = store
        self.paths = list(paths)
        self.batch_size = batch_size
        self.include_labels = include_labels
        # labels_as_mask = num_classes: ship the valid-pixel predicate
        # (label < num_classes) packed 8 pixels/byte instead of the uint8
        # label plane — exact for consumers that read labels only through
        # ops/entropy.valid_mask (the MC vote-entropy sweeps), and cuts the
        # bandwidth-bound relay wire from 4 to 3.125 bytes/pixel. The
        # 'label' batch entry becomes (B, H, ceil(W/8)) uint8; kernels
        # unpack with ops/entropy.unpack_mask (labels_packed=True).
        self.labels_as_mask = labels_as_mask
        if labels_as_mask is not None and not (include_labels
                                               and device_normalize):
            raise ValueError("labels_as_mask requires include_labels and "
                             "device_normalize (the packed predicate rides "
                             "the uint8 device wire)")
        # device_normalize: yield uint8 images (geometry only on host) and
        # let the scoring kernel apply /255-mean/std on device — identical
        # f32 elementwise math, 4x fewer host->device bytes, and the host
        # producer thread sheds its biggest per-image cost (selection/
        # kernels.normalize_on_device is the device half).
        self.device_normalize = device_normalize
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
            sample = self._scalecrop(
                {"image": rec[:, :, 0:3], "label": rec[:, :, 3]})
            return sample if self.device_normalize else self._norm(sample)
        img = self._scalecrop_image(rec[:, :, 0:3])
        return img if self.device_normalize else self._norm_image(img)

    def iter_chunks(self) -> Iterator[list]:
        """Path chunks in batch order — the cheap enumeration half of
        iteration, so ``build_batch`` (the expensive geometry half) can
        run in prefetch WORKER threads instead of the serial feeder:
        the native imresize fast path releases the GIL, so per-batch
        geometry parallelizes across workers on multi-core TPU-VM hosts
        (a no-op on this 1-core bench VM)."""
        for start in range(0, len(self.paths), self.batch_size):
            yield self.paths[start: start + self.batch_size]

    def build_batch(self, chunk) -> dict:
        """Store reads + geometry + wire packing for one path chunk.

        Fast path ships uint8 for labels too: the relay link is
        bandwidth-bound (~20 MB/s), and f32 labels cost MORE bytes than
        the uint8 images; every consumer only reads labels through
        valid_mask / integer compares, which cast anyway."""
        img_dtype = np.uint8 if self.device_normalize else np.float32
        lab_dtype = np.uint8 if self.device_normalize else np.float32
        samples = [self._get(p) for p in chunk]
        nvalid = len(samples)
        while len(samples) < self.batch_size:
            samples.append(samples[0])
        if self.include_labels:
            image = np.stack([s["image"] for s in samples]).astype(img_dtype)
            label = np.stack([s["label"] for s in samples]).astype(lab_dtype)
            if nvalid < self.batch_size:
                label[nvalid:] = 255
            if self.labels_as_mask is not None:
                # trailing packbits padding is zero bits -> invalid,
                # matching the 255-padded duplicates above
                valid = (label.astype(np.int32) >= 0) & (
                    label.astype(np.int32) < self.labels_as_mask)
                label = np.packbits(valid, axis=-1)
            return {"image": image, "label": label, "nvalid": nvalid,
                    "paths": chunk}
        image = np.stack(samples).astype(img_dtype)
        return {"image": image, "nvalid": nvalid, "paths": chunk}

    def __iter__(self) -> Iterator[dict]:
        for chunk in self.iter_chunks():
            yield self.build_batch(chunk)


def prefetch_to_device(iterator, device_put_fn, depth: int = 2,
                       workers: int = 1):
    """Host->device pipeline: producer threads apply ``device_put_fn``
    (typically a sharded jax.device_put) ahead of the consumer, overlapping
    host transform + transfer with device compute — the TPU analog of the
    reference's DataLoader worker prefetch.

    workers > 1 runs an ORDERED multi-worker pipeline: batches are handed
    to a thread pool and yielded strictly in input order (selection scores
    are matched to paths by position). Extra workers don't speed up
    CPU-bound transforms on a single core, but they overlap the
    latency-bound host->device transfers with the next batch's transform —
    on the axon relay that latency otherwise serializes behind the
    producer (measured: e2e pool scoring 12 -> ~host-ceiling imgs/s).
    """
    sentinel = object()
    err = []

    if workers <= 1:
        q: "queue.Queue" = queue.Queue(maxsize=depth)

        def producer():
            try:
                for item in iterator:
                    q.put(device_put_fn(item))
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
        return

    in_q: "queue.Queue" = queue.Queue(maxsize=depth + workers)
    results = {}
    cond = threading.Condition()
    done = [0]  # number of workers finished

    def feeder():
        try:
            for seq, item in enumerate(iterator):
                in_q.put((seq, item))
        except BaseException as e:
            err.append(e)
        finally:
            for _ in range(workers):
                in_q.put(sentinel)

    def worker():
        while True:
            task = in_q.get()
            if task is sentinel:
                break
            seq, item = task
            try:
                out = device_put_fn(item)
            except BaseException as e:
                err.append(e)
                break
            with cond:
                results[seq] = out
                cond.notify_all()
        with cond:
            done[0] += 1
            cond.notify_all()

    threading.Thread(target=feeder, daemon=True).start()
    for _ in range(workers):
        threading.Thread(target=worker, daemon=True).start()

    seq = 0
    while True:
        with cond:
            while seq not in results and done[0] < workers and not err:
                cond.wait()
            if err:
                raise err[0]
            if seq in results:
                item = results.pop(seq)
            else:  # all workers done and no next item -> exhausted
                return
        yield item
        seq += 1
