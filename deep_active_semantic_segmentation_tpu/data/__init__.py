"""Data layer: stores, transforms, AL pools, batch loaders.

Replaces the reference's lmdb + torch DataLoader stack (dataloaders/) with a
backend-pluggable key-value store, numpy transforms that reproduce the
reference numerics exactly, and NHWC batch iterators with device prefetch.
"""

from deep_active_semantic_segmentation_tpu.data.factory import make_dataloader  # noqa: F401
