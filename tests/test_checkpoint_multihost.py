"""Orbax checkpoint backend + multi-host input-sharding helpers."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.models.unet import UNet
from deep_active_semantic_segmentation_tpu.parallel.mesh import (
    make_mesh, process_batch_slice, shard_batch, shard_batch_from_local)
from deep_active_semantic_segmentation_tpu.parallel.steps import (
    init_train_state)
from deep_active_semantic_segmentation_tpu.utils.checkpoint import (
    load_checkpoint, save_checkpoint)


def _tiny_state(seed=0):
    model = UNet(in_channels=3, num_classes=2)
    return init_train_state(model, jax.random.PRNGKey(seed), (1, 32, 32, 3))


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_backend_roundtrip(tmp_path, monkeypatch):
    state = _tiny_state(0)
    path = str(tmp_path / "best.ckpt")
    monkeypatch.setenv("DASS_CKPT_BACKEND", "orbax")
    save_checkpoint(path, state, epoch=7, best_pred=0.42)
    assert os.path.isdir(path)  # orbax = directory checkpoint

    fresh = _tiny_state(1)  # different weights; restore must overwrite
    restored, payload = load_checkpoint(path, fresh)
    _tree_equal(restored.params, state.params)
    _tree_equal(restored.batch_stats, state.batch_stats)
    _tree_equal(restored.opt_state, state.opt_state)
    assert payload["epoch"] == 7
    assert abs(payload["best_pred"] - 0.42) < 1e-9

    # overwrite-in-place (the savers re-save per validation epoch)
    save_checkpoint(path, restored, epoch=8, best_pred=0.5)
    _, payload2 = load_checkpoint(path, fresh)
    assert payload2["epoch"] == 8


def test_msgpack_default_backend_unchanged(tmp_path):
    state = _tiny_state(2)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=3, best_pred=0.1)
    assert os.path.isfile(path)
    restored, payload = load_checkpoint(path, _tiny_state(3))
    _tree_equal(restored.params, state.params)
    assert payload["epoch"] == 3


def test_process_batch_slice_partitions_evenly():
    slices = [process_batch_slice(12, process_index=i, process_count=3)
              for i in range(3)]
    assert slices == [(0, 4), (4, 4), (8, 4)]
    with pytest.raises(AssertionError):
        process_batch_slice(10, process_index=0, process_count=3)


def test_shard_batch_from_local_matches_shard_batch_single_process():
    mesh = make_mesh()  # all 8 virtual CPU devices
    rng = np.random.RandomState(0)
    batch = {"image": rng.rand(8, 16, 16, 3).astype(np.float32),
             "label": rng.randint(0, 5, (8, 16, 16)).astype(np.uint8),
             "nvalid": 8}
    a = shard_batch(mesh, batch)
    start, size = process_batch_slice(8)
    assert (start, size) == (0, 8)  # single-process test environment
    b = shard_batch_from_local(mesh, {k: (v[start:start + size]
                                          if hasattr(v, "ndim") else v)
                                      for k, v in batch.items()})
    for k in ("image", "label"):
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    assert b["nvalid"] == 8
