"""Store round-trips, AL pool bookkeeping, loaders — against reference
semantics (cityscapes_base.py, active_cityscapes.py, region_cityscapes.py,
paths_dataset.py)."""

import os

import numpy as np
import pytest

from deep_active_semantic_segmentation_tpu.data.loader import Loader, PathsLoader
from deep_active_semantic_segmentation_tpu.data.pools import (
    CITYSCAPES, PASCAL, ActiveImagePool, ActiveRegionPool, PassivePool)
from deep_active_semantic_segmentation_tpu.data.store import (
    DirectoryStore, MemoryStore, open_store)

H, W, C_CLASSES = 48, 96, 19


def _make_records(n, seed=0):
    rng = np.random.RandomState(seed)
    recs = {}
    for i in range(n):
        img = rng.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
        lab = rng.randint(0, C_CLASSES, size=(H, W)).astype(np.uint8)
        recs[f"/img_{i:03d}.png".encode("ascii")] = np.dstack((img, lab))
    return recs


@pytest.fixture
def tiny_store():
    return MemoryStore(_make_records(12))


@pytest.fixture
def seeded(tmp_path, tiny_store):
    seed_dir = tmp_path / "seed_sets"
    seed_dir.mkdir()
    keys = tiny_store.keys()
    with open(seed_dir / "set_0.txt", "w") as f:
        for k in keys[:4]:
            f.write(k.decode() + "\n")
    return tiny_store, str(seed_dir)


def test_directory_store_roundtrip(tmp_path):
    store = DirectoryStore(str(tmp_path / "train"), readonly=False)
    recs = _make_records(3)
    for k, v in recs.items():
        store.put(k, v)
    store.finalize()
    loaded = open_store(str(tmp_path / "train"))
    assert loaded.keys() == list(recs.keys())
    for k, v in recs.items():
        assert np.array_equal(np.asarray(loaded.get(k)), v)


def test_active_image_pool_bookkeeping(seeded):
    store, seed_dir = seeded
    pool = ActiveImagePool(CITYSCAPES, store, base_size=33, crop_size=33,
                           split="train", init_set="set_0.txt",
                           seed_dir=seed_dir)
    assert len(pool) == 4
    assert len(pool.remaining_image_paths) == 8
    assert pool.labeled_pixel_count == 4 * 33 * 33

    to_add = pool.remaining_image_paths[:3]
    pool.expand_training_set(to_add)
    assert len(pool) == 7 and len(pool.remaining_image_paths) == 5
    assert abs(pool.get_fraction_of_labeled_data() - 7 / 12) < 1e-9

    pool.make_dataset_multiple_of_batchsize(4)
    assert len(pool) == 8
    pool.reset_dataset()
    assert len(pool) == 7

    item = pool.get_item(0)
    assert item["image"].shape == (33, 33, 3)
    assert item["label"].shape == (33, 33)


def test_weak_labels_served_past_labeled_range(seeded):
    store, seed_dir = seeded
    pool = ActiveImagePool(CITYSCAPES, store, 33, 33, "train",
                           "set_0.txt", seed_dir)
    weak_path = pool.remaining_image_paths[0]
    weak_target = np.full((33, 33), 7, np.uint8)
    pool.add_weak_labels({weak_path: weak_target})
    assert len(pool) == 5
    item = pool.get_item(4)
    assert np.array_equal(item["label"], weak_target.astype(np.float32))
    pool.clear_weak_labels()
    assert len(pool) == 4


def test_region_pool_masked_targets(seeded):
    store, seed_dir = seeded
    pool = ActiveRegionPool(CITYSCAPES, store, base_size=33, crop_size=33,
                            split="train", init_set="set_0.txt",
                            seed_dir=seed_dir)
    assert len(pool) == 4
    # seed images carry the full (0,0,crop,crop) region
    item = pool.get_item(0)
    assert (item["label"] != 255).any()

    new_path = [p for p in pool.image_paths
                if p not in pool.current_paths_to_regions_map][0]
    pool.expand_training_set({new_path: [(4, 6, 8, 8)]}, 8 * 8)
    assert len(pool) == 5
    assert pool.labeled_pixel_count == 4 * 33 * 33 + 64
    item = pool.get_item(4)
    lab = item["label"]
    assert (lab != 255).any() and (lab == 255).any()

    maps = pool.get_existing_region_maps()
    assert len(maps) == len(pool.image_paths)
    assert sum(len(m) for m in maps) == 5


def test_pascal_fraction_uses_base_size(seeded):
    store, seed_dir = seeded
    pool = ActiveImagePool(PASCAL, store, base_size=64, crop_size=-1,
                           split="train", init_set="set_0.txt",
                           seed_dir=seed_dir)
    assert pool.labeled_pixel_count == 4 * 64 * 64
    item = pool.get_item(0)
    assert item["image"].shape == (64, 64, 3)  # letterboxed


def test_loader_batches_and_padding(seeded):
    store, seed_dir = seeded
    pool = ActiveImagePool(CITYSCAPES, store, 33, 33, "train",
                           "set_0.txt", seed_dir)
    pool.expand_training_set(pool.remaining_image_paths[:1])  # 5 samples
    loader = Loader(pool, batch_size=2, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 33, 33, 3)
    assert batches[-1]["nvalid"] == 1
    assert np.all(batches[-1]["label"][1] == 255.0)


def test_paths_loader_modes(tiny_store):
    paths = tiny_store.keys()[:5]
    pl = PathsLoader(tiny_store, paths, crop_size=33, batch_size=2,
                     include_labels=True)
    batches = list(pl)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 33, 33, 3)
    assert batches[0]["label"].shape == (2, 33, 33)
    assert batches[-1]["nvalid"] == 1 and np.all(batches[-1]["label"][1:] == 255.0)

    pl2 = PathsLoader(tiny_store, paths, crop_size=-1, batch_size=2,
                      include_labels=False)
    b = next(iter(pl2))
    assert b["image"].shape == (2, 512, 512, 3)  # paths_dataset.py:16 base 512


def test_passive_pool(tiny_store):
    pool = PassivePool(CITYSCAPES, tiny_store, 33, 33, "val")
    assert len(pool) == 12
    pool.make_dataset_multiple_of_batchsize(5)
    assert len(pool) == 15
    pool.reset_dataset()
    assert len(pool) == 12


def test_colormaps():
    from deep_active_semantic_segmentation_tpu.data import colormaps
    seg = np.array([[0, 1], [255, 18]], np.uint8)
    out = colormaps.map_segmentation_to_colors(seg, "cityscapes")
    assert out.shape == (2, 2, 3)
    assert np.allclose(out[0, 0], np.array([128, 64, 128]) / 255.0)
    pascal = colormaps.create_pascal_label_colormap()
    assert pascal[1] == [128, 0, 0]  # canonical VOC class-1 color


def test_uint8_device_normalize_path_is_bit_identical(tiny_store):
    """The uint8 scoring fast path (PathsLoader device_normalize=True +
    kernels.normalize_on_device) must reproduce the host-normalized f32
    batches BIT-exactly — elementwise f32 is deterministic across host
    and device, and selection fidelity rides on it."""
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.selection.kernels import (
        normalize_on_device)

    paths = tiny_store.keys()[:5]
    host = list(PathsLoader(tiny_store, paths, crop_size=33, batch_size=2,
                            include_labels=True))
    fast = list(PathsLoader(tiny_store, paths, crop_size=33, batch_size=2,
                            include_labels=True, device_normalize=True))
    assert len(host) == len(fast)
    for h, f in zip(host, fast):
        assert f["image"].dtype == np.uint8 and f["label"].dtype == np.uint8
        normed = np.asarray(normalize_on_device(jnp.asarray(f["image"])))
        np.testing.assert_array_equal(normed, h["image"])
        np.testing.assert_array_equal(f["label"].astype(np.float32),
                                      h["label"])
        # float inputs pass through untouched
        passthrough = normalize_on_device(jnp.asarray(h["image"]))
        np.testing.assert_array_equal(np.asarray(passthrough), h["image"])


def test_train_loader_uint8_wire_is_bit_identical(tiny_store):
    """The TRAIN loop's uint8 wire (pools device_normalize=True, round 5):
    the eval transform's uint8 batch, normalized by the step-side ingest
    (steps._ingest_wire), must reproduce the host-Normalize f32 batch
    BIT-exactly; labels cast exactly. (The train transform's random
    augmentations preclude a paired run, but the geometry stages are the
    same objects — the eval path covers the normalize seam.)"""
    from deep_active_semantic_segmentation_tpu.data.loader import Loader
    from deep_active_semantic_segmentation_tpu.data.pools import (
        CITYSCAPES, PassivePool)
    from deep_active_semantic_segmentation_tpu.parallel.steps import (
        _ingest_wire)

    def batches(device_normalize):
        pool = PassivePool(CITYSCAPES, tiny_store, 33, 33, "val",
                           device_normalize=device_normalize)
        return list(Loader(pool, 2))

    host = batches(False)
    fast = batches(True)
    assert len(host) == len(fast)
    for h, f in zip(host, fast):
        assert f["image"].dtype == np.uint8 and f["label"].dtype == np.uint8
        assert h["image"].dtype == np.float32
        img, lab = _ingest_wire(f)
        np.testing.assert_array_equal(np.asarray(img), h["image"])
        np.testing.assert_array_equal(np.asarray(lab), h["label"])
        assert f["nvalid"] == h["nvalid"]
        # the f32 wire passes through the same ingest untouched
        img2, lab2 = _ingest_wire(h)
        np.testing.assert_array_equal(np.asarray(img2), h["image"])


def test_paths_loader_labels_as_mask(tiny_store):
    """Packed-mask wire: 'label' becomes the packbits'd valid predicate
    (8 px/byte); padded duplicate samples arrive all-invalid; unpack_mask
    inverts it exactly."""
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.ops.entropy import unpack_mask

    paths = tiny_store.keys()[:5]
    plain = PathsLoader(tiny_store, paths, crop_size=33, batch_size=2,
                        include_labels=True, device_normalize=True)
    packed = PathsLoader(tiny_store, paths, crop_size=33, batch_size=2,
                         include_labels=True, device_normalize=True,
                         labels_as_mask=19)
    for bp, bm in zip(plain, packed):
        assert bm["label"].dtype == np.uint8
        assert bm["label"].shape == (2, 33, (33 + 7) // 8)
        want = (bp["label"].astype(np.int32) >= 0) & (
            bp["label"].astype(np.int32) < 19)
        got = np.asarray(unpack_mask(jnp.asarray(bm["label"]), 33))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(bp["image"], bm["image"])
    assert bm["nvalid"] == 1 and not got[1:].any()


def test_paths_loader_chunk_build_equals_iter(tiny_store):
    """iter_chunks + build_batch (the worker-threaded selector path) must
    reproduce plain iteration exactly, order included."""
    paths = tiny_store.keys()[:5]
    pl = PathsLoader(tiny_store, paths, crop_size=33, batch_size=2,
                     include_labels=True, device_normalize=True,
                     labels_as_mask=19)
    direct = list(pl)
    rebuilt = [pl.build_batch(c) for c in pl.iter_chunks()]
    assert len(direct) == len(rebuilt)
    for a, b in zip(direct, rebuilt):
        assert a["paths"] == b["paths"] and a["nvalid"] == b["nvalid"]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])
