"""Selection engine: every scorer exercised end-to-end on a tiny pool with
a real (tiny) model, checking counts, ordering semantics, and geometry."""

import os

import jax
import numpy as np
import pytest

from deep_active_semantic_segmentation_tpu.data.store import MemoryStore
from deep_active_semantic_segmentation_tpu.models.accuracy_predictor import (
    DeepLabAccuracyPredictor)
from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
from deep_active_semantic_segmentation_tpu.selection import (
    ModelBundle, get_active_selection_class, get_max_subset_active_selector)
from deep_active_semantic_segmentation_tpu.selection import core_set as core_set_mod

CROP = 33
NCLS = 5
N_POOL = 7


@pytest.fixture(scope="module")
def store():
    rng = np.random.RandomState(0)
    recs = {}
    for i in range(N_POOL):
        img = rng.randint(0, 255, size=(40, 56, 3), dtype=np.uint8)
        lab = rng.randint(0, NCLS, size=(40, 56)).astype(np.uint8)
        lab[:4] = 255
        recs[f"/img_{i}.png".encode()] = np.dstack((img, lab))
    return MemoryStore(recs)


@pytest.fixture(scope="module")
def deeplab_bundle():
    model = DeepLab(num_classes=NCLS, backbone="mobilenet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, CROP, CROP, 3), np.float32),
                           train=False)
    return ModelBundle(model, variables["params"], variables["batch_stats"])


@pytest.fixture(scope="module")
def acc_bundle():
    model = DeepLabAccuracyPredictor(num_classes=NCLS, backbone="mobilenet",
                                     output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, CROP, CROP, 3), np.float32),
                           train=False)
    return ModelBundle(model, variables["params"], variables["batch_stats"])


def _paths(store):
    return store.keys()


def test_random_selector(store):
    sel = get_active_selection_class("random", NCLS, store, CROP, 2)
    import random
    random.seed(0)
    picked = sel.get_random_uncertainity(_paths(store), 3)
    assert len(picked) == 3 and len(set(picked)) == 3


def test_ceal_selectors(store, deeplab_bundle):
    sel = get_active_selection_class("ceal_entropy", NCLS, store, CROP, 2)
    picked, entropies = sel.get_maximum_entropy_samples(
        deeplab_bundle, _paths(store), 3)
    assert len(picked) == 3 and len(entropies) == N_POOL
    # descending entropy order
    by_path = dict(zip(_paths(store), entropies))
    vals = [by_path[p] for p in picked]
    assert vals == sorted(vals, reverse=True)

    lc = sel.get_least_confident_samples(deeplab_bundle, _paths(store), 2)
    lm = sel.get_least_margin_samples(deeplab_bundle, _paths(store), 2)
    assert len(lc) == 2 and len(lm) == 2

    fusion = sel.get_fusion_of_confidence_margin_entropy_samples(
        deeplab_bundle, _paths(store), 3)
    assert len(fusion) == 3

    weak = sel.get_weakly_labeled_data(deeplab_bundle, _paths(store),
                                       threshold=np.max(entropies) + 1.0)
    assert len(weak) == N_POOL
    some = next(iter(weak.values()))
    assert some.shape == (CROP, CROP) and some.dtype == np.uint8
    assert (some == 255).any()  # ignored pixels masked (ceal.py:163)


def test_mc_dropout_image_selection_deterministic(store, deeplab_bundle):
    sel = get_active_selection_class("variance", NCLS, store, CROP, 2)
    a = sel.get_vote_entropy_for_images(deeplab_bundle, _paths(store), 3, seed=7)
    b = sel.get_vote_entropy_for_images(deeplab_bundle, _paths(store), 3, seed=7)
    assert a == b and len(a) == 3
    c = sel.get_vote_entropy_for_images(deeplab_bundle, _paths(store), 3, seed=8)
    assert len(c) == 3  # different seed may or may not reorder; just runs


def test_mc_dropout_region_maps(store, deeplab_bundle):
    sel = get_active_selection_class("variance", NCLS, store, CROP, 2)
    region_size = 9
    existing = [[] for _ in range(N_POOL)]
    existing[0] = [(0, 0, CROP, CROP)]  # fully labeled -> suppressed
    regions, count = sel.create_region_maps(
        deeplab_bundle, _paths(store), existing, region_size,
        selection_size=1, seed=0)
    assert count > 0
    assert _paths(store)[0] not in regions  # suppressed image gets no boxes
    S = CROP - region_size + 1
    for path, boxes in regions.items():
        for (r, c, h, w) in boxes:
            assert 0 <= r < S and 0 <= c < S and h == w == region_size


def test_mc_noise_selectors(store, deeplab_bundle):
    sel = get_active_selection_class("noise_image", NCLS, store, CROP, 2)
    a = sel.get_vote_entropy_for_images_with_input_noise(
        deeplab_bundle, _paths(store), 2)
    b = sel.get_vote_entropy_for_images_with_feature_noise(
        deeplab_bundle, _paths(store), 2)
    c = sel.get_vote_entropy_for_batch_with_noise_and_vote_entropy(
        deeplab_bundle, _paths(store), 2)
    assert len(a) == len(b) == len(c) == 2
    regions, count = sel.create_region_maps(
        deeplab_bundle, _paths(store), [[] for _ in range(N_POOL)], 9, 1)
    assert count > 0


def test_core_set(store, deeplab_bundle, monkeypatch):
    monkeypatch.setitem(core_set_mod.POOLING, "deeplab", (4, 2))
    sel = get_active_selection_class("coreset", NCLS, store, CROP, 2)
    already = _paths(store)[:2]
    candidates = _paths(store)[2:]
    picked = sel.get_k_center_greedy_selections(3, deeplab_bundle,
                                               candidates, already)
    assert len(picked) == 3
    assert all(p in candidates for p in picked)
    assert len(set(picked)) == 3


def test_max_subset_images(store, deeplab_bundle, monkeypatch):
    sel = get_max_subset_active_selector(store, CROP, 2)
    import deep_active_semantic_segmentation_tpu.selection.max_subset as ms

    def small_pool(bundle, images):
        import jax.numpy as jnp
        from deep_active_semantic_segmentation_tpu.selection import kernels
        loader = sel._paths_loader(images, include_labels=False)
        feats = []
        for batch in loader:
            f = kernels.pooled_features(bundle.model, bundle.variables,
                                        jnp.asarray(batch["image"]), 4, 2)
            feats.extend(np.asarray(f)[: batch["nvalid"]])
        return feats

    monkeypatch.setattr(ActiveSelectionMaxSubsetPatch := type(sel),
                        "_get_features_for_images",
                        lambda self, bundle, images: small_pool(bundle, images))
    picked = sel.get_representative_images(deeplab_bundle, _paths(store),
                                           _paths(store)[:4])
    assert len(picked) == 2  # half of candidates (max_subset.py:134)


def test_max_subset_regions(store, deeplab_bundle):
    sel = get_max_subset_active_selector(store, CROP, 2)
    candidate_regions = {
        _paths(store)[1]: [(0, 0, 9, 9), (10, 10, 9, 9)],
        _paths(store)[2]: [(5, 5, 9, 9), (20, 2, 9, 9)],
    }
    regions, count = sel.get_representative_regions(
        deeplab_bundle, _paths(store), candidate_regions, 9)
    assert count == 2  # half of 4 candidates
    total = sum(len(v) for v in regions.values())
    assert total == 2


def test_accuracy_selectors(store, acc_bundle):
    sel = get_active_selection_class("accuracy_labels", NCLS, store, CROP, 2)
    a = sel.get_least_accurate_sample_using_labels(acc_bundle, _paths(store), 2)
    b = sel.get_least_accurate_samples(acc_bundle, _paths(store), 2, "softmax")
    c = sel.get_least_accurate_samples(acc_bundle, _paths(store), 2, "argmax")
    d = sel.get_adversarially_vulnarable_samples(acc_bundle, _paths(store), 2)
    e = sel.get_unsure_samples(acc_bundle, _paths(store), 2)
    assert all(len(x) == 2 for x in (a, b, c, d, e))
    regions, count = sel.get_least_accurate_region_maps(
        acc_bundle, _paths(store), [[] for _ in range(N_POOL)], 9, 1)
    assert count > 0


def test_wait_for_selected_samples(store, tmp_path):
    sel = get_active_selection_class("accuracy_eval", NCLS, store, CROP, 2)
    sfile = tmp_path / "selections.txt"
    paths = _paths(store)
    with open(sfile, "w") as f:
        f.write(paths[1].decode() + "\n")
        f.write("/not_in_pool.png\n")
        f.write(paths[3].decode() + "\n")
    got = sel.wait_for_selected_samples(str(sfile), paths, poll_seconds=0.01)
    assert got == [paths[1], paths[3]]
    with pytest.raises(TimeoutError):
        sel.wait_for_selected_samples(str(tmp_path / "missing.txt"), paths,
                                      poll_seconds=0.01, timeout=0.05)


def test_scoring_precision_is_per_instance(store, deeplab_bundle):
    """Two in-process selectors with different precisions must be
    independent (no module-global mutation): the instance setting alone
    decides the matmul precision each scorer runs at."""
    sel_hi = get_active_selection_class("ceal_entropy", NCLS, store, CROP, 2,
                                        scoring_precision="highest")
    sel_def = get_active_selection_class("ceal_entropy", NCLS, store, CROP, 2,
                                         scoring_precision="default")

    def probe(sel):
        with sel.precision_scope():
            import jax
            return jax.config.jax_default_matmul_precision

    assert probe(sel_hi) == "highest"
    assert probe(sel_def) == "default"
    # interleaved use: each scorer still produces valid rankings under its
    # own scope, with the other instance's setting never leaking
    p1 = sel_hi.get_maximum_entropy_samples(deeplab_bundle, _paths(store), 2)[0]
    assert probe(sel_def) == "default"
    p2 = sel_def.get_maximum_entropy_samples(deeplab_bundle, _paths(store), 2)[0]
    assert probe(sel_hi) == "highest"
    assert len(p1) == 2 and len(p2) == 2
