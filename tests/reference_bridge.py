"""Bridge for running the REAL reference implementation (/root/reference)
on CPU inside our test suite.

The reference targets a CUDA-era stack (torchvision, scipy<1.3's
``scipy.misc.imresize``, numpy<1.24's ``np.bool``, py-lmdb, ``.cuda()``
everywhere). This module reconstructs exactly that surface so the
reference's *selectors* can run unmodified against the same pixels and the
same transplanted weights as ours — the selection-rank-agreement north star
(BASELINE.json) measured against the actual reference, not ours-vs-ours.

Nothing here is framework code; it is test scaffolding only.
"""

from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import torch

REF = "/root/reference"

_installed = False


def install_shims():
    """Install import/runtime shims. Idempotent."""
    global _installed
    if _installed:
        return
    # numpy<1.24 alias (reference ceal.py:85, accuracy.py uses np.bool)
    if not hasattr(np, "bool"):
        np.bool = bool  # noqa: NPY001
    # CPU-only torch: make .cuda() a no-op and alias the cuda tensor ctor
    # (reference calls torch.cuda.FloatTensor(...) as a constructor,
    # mc_dropout.py:37,44).
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = _module_cuda_noop
    torch.cuda.FloatTensor = torch.FloatTensor
    # scipy>=1.3 removed scipy.misc.imresize; inject our bit-identical port
    # (data/transforms.py, golden-tested vs the legacy behaviour).
    import scipy.misc

    from deep_active_semantic_segmentation_tpu.data.transforms import imresize

    scipy.misc.imresize = imresize
    # torchvision: only transforms.{Compose,ToTensor,Normalize} are used
    # (reference dataloaders/dataset/paths_dataset.py:1,39-50).
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.Compose = _Compose
        tr.ToTensor = _ToTensor
        tr.Normalize = _Normalize
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    # py-lmdb is absent; dataset modules import it at module scope. The
    # fake env below never touches it.
    if "lmdb" not in sys.modules:
        fake = types.ModuleType("lmdb")

        def _no_open(*a, **k):
            raise RuntimeError("fake lmdb: use FakeLmdbEnv")

        fake.open = _no_open
        sys.modules["lmdb"] = fake
    _installed = True


def _module_cuda_noop(self, *a, **k):
    return self


class _Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class _ToTensor:
    """torchvision.transforms.ToTensor: HWC uint8 [0,255] -> CHW float [0,1]."""

    def __call__(self, arr):
        arr = np.asarray(arr)
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        return t.float().div(255.0)


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class FakeLmdbEnv:
    """The slice of the py-lmdb Environment protocol PathsDataset uses:
    ``with env.begin(write=False) as txn: txn.get(key)`` returning pickled
    HxWx4 uint8 arrays (reference paths_dataset.py:32-33). With
    ``with_keys=True`` it also serves the converters' ``__keys__`` /
    ``__len__`` metadata records (utils/cityscapes_to_lmdb.py:53-55) that
    the reference DATASET classes read at construction
    (cityscapes_base.py:17-19)."""

    def __init__(self, records, with_keys: bool = False):
        self._records = {k: pickle.dumps(np.asarray(v)) for k, v in
                         records.items()}
        if with_keys:
            keys = sorted(records.keys())
            self._records[b"__keys__"] = pickle.dumps(keys)
            self._records[b"__len__"] = pickle.dumps(len(keys))

    def begin(self, write=False):
        return _FakeTxn(self._records)


def set_lmdb_stores(stores_by_path: dict):
    """Point the fake ``lmdb.open`` at per-path record dicts so the
    reference's dataset classes construct unmodified: keys are matched as
    substrings of the requested db path (cityscapes_base.py:17 opens
    ``<root>/<split>.db``). Call with {} to restore the fail-fast stub."""
    install_shims()
    fake = sys.modules["lmdb"]

    def _open(path, *a, **k):
        # longest fragment first ("refcity_val" must beat "refcity")
        for frag in sorted(stores_by_path, key=len, reverse=True):
            if frag in str(path):
                return FakeLmdbEnv(stores_by_path[frag], with_keys=True)
        raise RuntimeError(f"fake lmdb: no store registered for {path}")

    def _no_open(*a, **k):
        raise RuntimeError("fake lmdb: use FakeLmdbEnv")

    fake.open = _open if stores_by_path else _no_open


class _FakeTxn:
    def __init__(self, records):
        self._records = records

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def get(self, key):
        return self._records[key]


class FakeDataParallel(torch.nn.Module):
    """Stand-in for torch.nn.DataParallel: selectors reach the wrapped
    model at ``model.module`` (core_set.py:44-52) and call the wrapper."""

    def __init__(self, module):
        super().__init__()
        self.module = module

    def forward(self, *a, **k):
        return self.module(*a, **k)


def import_reference(modname: str):
    """Import a module from /root/reference with shims installed."""
    install_shims()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import importlib

        return importlib.import_module(modname)
    finally:
        if REF in sys.path:
            sys.path.remove(REF)


def build_reference_model(builder):
    """Build a reference torch model without network access (their
    pretrained loaders hit model_zoo URLs)."""
    install_shims()
    import torch.utils.model_zoo as model_zoo

    orig = model_zoo.load_url
    model_zoo.load_url = lambda *a, **k: {}
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        return builder()
    finally:
        sys.path.remove(REF)
        model_zoo.load_url = orig


def make_records(num_images: int, height: int = 100, width: int = 150,
                 num_classes: int = 19, seed: int = 0, split: str = "train"):
    """Synthetic pool records, keyed like the cityscapes converter
    (utils/cityscapes_to_lmdb.py key scheme). Images vary in contrast so
    uncertainty scorers produce genuinely different per-image scores."""
    rng = np.random.RandomState(seed)
    records = {}
    for i in range(num_images):
        scale = 0.25 + 1.5 * (i / max(num_images - 1, 1))
        base = rng.randint(0, 256, size=(height, width, 3)).astype(np.float64)
        img = np.clip(128 + (base - 128) * scale, 0, 255).astype(np.uint8)
        lab = rng.randint(0, num_classes, size=(height, width)).astype(np.uint8)
        # sprinkle ignore regions so the 255-mask path is exercised
        r0, c0 = rng.randint(0, height // 2), rng.randint(0, width // 2)
        lab[r0:r0 + height // 4, c0:c0 + width // 4] = 255
        key = f"/leftImg8bit/{split}/city/img_{i:03d}.png".encode()
        records[key] = np.dstack((img, lab))
    return records


def topk_overlap(a, b, k: int) -> float:
    return len(set(list(a)[:k]) & set(list(b)[:k])) / float(k)


def spearman(x, y) -> float:
    """Spearman rank correlation without scipy.stats dependency jitter."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    rx = np.argsort(np.argsort(x)).astype(np.float64)
    ry = np.argsort(np.argsort(y)).astype(np.float64)
    rx -= rx.mean()
    ry -= ry.mean()
    denom = np.sqrt((rx ** 2).sum() * (ry ** 2).sum())
    return float((rx * ry).sum() / denom) if denom else 1.0
