"""Selection-rank agreement vs the ACTUAL reference implementation.

North star #2 (BASELINE.json): >=95% selection-rank agreement with the
reference. Round-1 measured this ours-vs-ours; here the reference's own
selectors (/root/reference/active_selection/*) run on CPU via
tests/reference_bridge.py, on the SAME pixels (shared record dict) and the
SAME weights (torch->flax transplant, models/pretrained.py), and their
selections are compared to ours:

* deterministic scorers (CEAL confidence/margin/entropy, oracle accuracy)
  — full-ranking and top-k agreement, expected ~100%;
* deterministic greedy algorithms (k-center, square NMS) — imported
  directly from the reference and required to match EXACTLY;
* stochastic MC-dropout — distributional check (rank correlation of mean
  vote entropies across independent RNG streams).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_bridge as rb

NUM_CLASSES = 19
CROP = 65
BATCH = 4
N_POOL = 20


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def records():
    return rb.make_records(N_POOL, num_classes=NUM_CLASSES, seed=7)


@pytest.fixture(scope="module")
def paths(records):
    return sorted(records.keys())


@pytest.fixture(scope="module")
def ref_env(records):
    return rb.FakeLmdbEnv(records)


@pytest.fixture(scope="module")
def our_store(records):
    from deep_active_semantic_segmentation_tpu.data.store import MemoryStore

    return MemoryStore(dict(records))


@pytest.fixture(scope="module")
def models():
    """(reference torch DeepLab wrapped in FakeDataParallel, our ModelBundle)
    sharing identical weights."""
    torch.manual_seed(11)

    def build():
        from models.deeplab import DeepLab as TorchDeepLab

        return TorchDeepLab(backbone="mobilenet", output_stride=16,
                            num_classes=NUM_CLASSES, sync_bn=False,
                            mc_dropout=True, pretrained=False)

    tmodel = rb.build_reference_model(build)
    tmodel.eval()

    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        apply_torch_weights, deeplab_state_dict_to_flax)
    from deep_active_semantic_segmentation_tpu.selection.base import ModelBundle

    model = DeepLab(num_classes=NUM_CLASSES, backbone="mobilenet",
                    output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, CROP, CROP, 3), jnp.float32),
                           train=False)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    p, s = deeplab_state_dict_to_flax(sd, "mobilenet")
    variables = apply_torch_weights(variables, p, s)
    bundle = ModelBundle(model=model, params=variables["params"],
                         batch_stats=variables["batch_stats"])
    return rb.FakeDataParallel(tmodel), bundle


@pytest.fixture(scope="module")
def ref_ceal(ref_env):
    mod = rb.import_reference("active_selection.ceal")
    return mod.ActiveSelectionCEAL(NUM_CLASSES, ref_env, CROP, BATCH)


@pytest.fixture(scope="module")
def our_ceal(our_store):
    from deep_active_semantic_segmentation_tpu.selection.ceal import (
        ActiveSelectionCEAL)

    return ActiveSelectionCEAL(NUM_CLASSES, our_store, CROP, BATCH)


# ---------------------------------------------------------------------------
# deterministic scorers: full-ranking agreement
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["get_least_confident_samples",
                                    "get_least_margin_samples"])
def test_ceal_ranking_agreement(method, ref_ceal, our_ceal, models, paths):
    ref_model, bundle = models
    ref_rank = list(getattr(ref_ceal, method)(ref_model, list(paths), N_POOL))
    our_rank = list(getattr(our_ceal, method)(bundle, list(paths), N_POOL))
    overlap8 = rb.topk_overlap(ref_rank, our_rank, 8)
    assert overlap8 >= 0.95, (overlap8, ref_rank[:8], our_rank[:8])
    # positions of each path in the two rankings must correlate ~perfectly
    pos_ref = {p: i for i, p in enumerate(ref_rank)}
    rho = rb.spearman([pos_ref[p] for p in our_rank], range(len(our_rank)))
    assert rho > 0.99, rho


def test_ceal_entropy_scores_agree(ref_ceal, our_ceal, models, paths):
    """Entropy is the one CEAL scorer whose raw per-image scores the
    reference returns — compare them numerically, not just by rank."""
    ref_model, bundle = models
    ref_rank, ref_scores = ref_ceal.get_maximum_entropy_samples(
        ref_model, list(paths), N_POOL)
    our_scores = our_ceal._get_entropies(bundle, list(paths))
    np.testing.assert_allclose(np.asarray(our_scores),
                               np.asarray(ref_scores), atol=5e-4)
    our_rank, _ = our_ceal.get_maximum_entropy_samples(bundle, list(paths),
                                                       N_POOL)
    assert rb.topk_overlap(ref_rank, our_rank, 8) >= 0.95


def test_ceal_weak_labels_agree(ref_ceal, our_ceal, models, paths):
    ref_model, bundle = models
    _, entropies = ref_ceal.get_maximum_entropy_samples(ref_model,
                                                        list(paths), N_POOL)
    threshold = float(np.median(entropies))
    ref_weak = ref_ceal.get_weakly_labeled_data(ref_model, list(paths),
                                                threshold)
    our_weak = our_ceal.get_weakly_labeled_data(bundle, list(paths),
                                                threshold)
    assert set(ref_weak.keys()) == set(our_weak.keys())
    agree = []
    for k in ref_weak:
        a = np.asarray(ref_weak[k])
        b = np.asarray(our_weak[k])
        agree.append(float(np.mean(a == b)))
    assert np.mean(agree) > 0.99, np.mean(agree)


def test_accuracy_oracle_agreement(ref_env, our_store, models, paths):
    ref_mod = rb.import_reference("active_selection.accuracy")
    ref_sel = ref_mod.ActiveSelectionAccuracy(NUM_CLASSES, ref_env, CROP,
                                              BATCH)
    from deep_active_semantic_segmentation_tpu.selection.accuracy import (
        ActiveSelectionAccuracy)

    our_sel = ActiveSelectionAccuracy(NUM_CLASSES, our_store, CROP, BATCH)
    ref_model, bundle = models
    ref_rank = list(ref_sel.get_least_accurate_sample_using_labels(
        ref_model, list(paths), N_POOL))
    our_rank = list(our_sel.get_least_accurate_sample_using_labels(
        bundle, list(paths), N_POOL))
    assert rb.topk_overlap(ref_rank, our_rank, 8) >= 0.95, (
        ref_rank[:8], our_rank[:8])


# ---------------------------------------------------------------------------
# deterministic greedy algorithms: import the reference, require EXACT match
# ---------------------------------------------------------------------------

def test_kcenter_greedy_matches_reference_exactly():
    mod = rb.import_reference("active_selection.core_set")
    sel = mod.ActiveSelectionCoreSet(None, CROP, BATCH)
    rng = np.random.RandomState(3)
    features = rng.randn(64, 48).astype(np.float64)
    seed_idx = list(range(8))
    ref_order = sel._select_batch(features, list(seed_idx), 12)

    from deep_active_semantic_segmentation_tpu.ops.distance import (
        kcenter_greedy)

    seed_mask = np.zeros(64, bool)
    seed_mask[seed_idx] = True
    ours = np.asarray(kcenter_greedy(jnp.asarray(features, jnp.float32),
                                     jnp.asarray(seed_mask), 12))
    assert list(ours) == list(ref_order), (list(ours), list(ref_order))


def test_square_nms_matches_reference_exactly():
    mod = rb.import_reference("active_selection.mc_dropout")
    rng = np.random.RandomState(5)
    maps = rng.rand(5, 80, 80).astype(np.float32)
    region = 17
    ref_regions, ref_count = mod.ActiveSelectionMCDropout.square_nms(
        torch.from_numpy(maps.copy()), region, 20)

    from deep_active_semantic_segmentation_tpu.ops.region import square_nms

    our_regions, our_count = square_nms(maps.copy(), region, 20)
    assert our_count == ref_count
    assert [list(map(tuple, r)) for r in our_regions] == \
        [list(map(tuple, r)) for r in ref_regions]


def test_nms_png_fixtures_golden():
    """The reference's checked-in NMS regression fixtures
    (resources/images/nms_{0,1}.png, consumed by tests.py:213-231):
    box-filter the two real score maps, min-max normalize (as
    create_region_maps does, mc_dropout.py:148-155), and require our NMS
    and the reference NMS to select IDENTICAL box sequences."""
    from PIL import Image

    img0 = np.asarray(Image.open("tests/fixtures/nms_0.png"),
                      dtype=np.float32) / 256
    img1 = np.asarray(Image.open("tests/fixtures/nms_1.png"),
                      dtype=np.float32) / 256
    region = 127

    from deep_active_semantic_segmentation_tpu.ops.region import (
        box_sum_valid, square_nms)

    ours_maps = np.asarray(box_sum_valid(jnp.stack([jnp.asarray(img0),
                                                    jnp.asarray(img1)]),
                                         region))
    # cross-check the box filter against torch's conv2d on the same inputs
    w = torch.ones(1, 1, region, region)
    ref_maps = torch.cat([
        torch.nn.functional.conv2d(torch.from_numpy(i)[None, None], w)
        for i in (img0, img1)]).squeeze(1).numpy()
    assert np.max(np.abs(ours_maps - ref_maps)) / ref_maps.max() < 1e-5

    lo, hi = ref_maps.min(), ref_maps.max()
    norm = (ref_maps - lo) / (hi - lo)

    mod = rb.import_reference("active_selection.mc_dropout")
    max_count = (512 * 512) // (region * region)
    ref_regions, ref_count = mod.ActiveSelectionMCDropout.square_nms(
        torch.from_numpy(norm.copy()), region, max_count)
    our_regions, our_count = square_nms(norm.copy(), region, max_count)
    assert our_count == ref_count
    assert [list(map(tuple, r)) for r in our_regions] == \
        [list(map(tuple, r)) for r in ref_regions]
    # golden anchor: both images must yield at least one box and all boxes
    # must lie inside the valid score-map geometry
    S = norm.shape[1]
    for regs in our_regions:
        assert regs
        for (r, c, h, w_) in regs:
            assert 0 <= r < S and 0 <= c < S and h == region and w_ == region


# ---------------------------------------------------------------------------
# stochastic MC dropout: distributional agreement
# ---------------------------------------------------------------------------

def test_mc_dropout_entropy_distributional_agreement(ref_env, our_store,
                                                     models, paths):
    """MC vote entropy is stochastic, and on a random-init model the
    between-image signal is BELOW the 20-step MC sampling noise: even two
    reference runs with different torch seeds only rank-correlate at
    rho~0.25 (measured), so rank agreement is not a usable metric here.
    The meaningful equivalence is noise-calibrated: our per-image mean
    entropies must sit inside the reference's own seed-to-seed variation
    band (measured from two reference runs)."""
    sub = list(paths)[:12]
    ref_model, bundle = models

    mod = rb.import_reference("active_selection.mc_dropout")
    ref_sel = mod.ActiveSelectionMCDropout(NUM_CLASSES, ref_env, CROP, BATCH)
    pd = rb.import_reference("dataloaders.dataset.paths_dataset")
    from torch.utils.data import DataLoader

    def ref_scores(seed):
        torch.manual_seed(seed)
        ref_model.apply(lambda m: m.train()
                        if type(m) == torch.nn.Dropout2d else None)
        loader = DataLoader(pd.PathsDataset(ref_env, sub, CROP,
                                            include_labels=True),
                            batch_size=BATCH, shuffle=False, num_workers=0)
        out = []
        for sample in loader:
            maps = ref_sel._get_vote_entropy_for_batch(
                ref_model, sample["image"], sample["label"])
            out.extend(float(torch.mean(m)) for m in maps)
        ref_model.eval()
        return np.asarray(out)

    r1, r2 = ref_scores(123), ref_scores(456)

    from deep_active_semantic_segmentation_tpu import constants
    from deep_active_semantic_segmentation_tpu.selection import kernels
    from deep_active_semantic_segmentation_tpu.selection.mc_dropout import (
        ActiveSelectionMCDropout)

    our_sel = ActiveSelectionMCDropout(NUM_CLASSES, our_store, CROP, BATCH)
    our_scores = []
    for batch in our_sel._paths_loader(sub, include_labels=True):
        maps = kernels.mc_vote_entropy_maps(
            bundle.model, bundle.variables, jnp.asarray(batch["image"]),
            jnp.asarray(batch["label"]), jax.random.PRNGKey(42),
            NUM_CLASSES, constants.MC_STEPS, "dropout")
        our_scores.extend(
            np.asarray(jnp.mean(maps, axis=(1, 2)))[: batch["nvalid"]])
    our_scores = np.asarray(our_scores)

    band = max(np.abs(r1 - r2).max(), 0.05)  # the reference's own MC noise
    ours_vs_ref = np.abs(our_scores - r1).max()
    assert ours_vs_ref <= 1.5 * band, (ours_vs_ref, band, our_scores, r1)
    # and the global entropy level must match closely
    assert abs(our_scores.mean() - r1.mean()) <= 3 * abs(r1.mean() - r2.mean()) + 0.05


def test_max_representative_matches_reference_exactly():
    """Greedy max-coverage selection (max_subset.py:17-39) — deterministic,
    so the reference's own implementation must be matched pick-for-pick."""
    mod = rb.import_reference("active_selection.max_subset")
    sel = mod.ActiveSelectionMaxSubset(None, CROP, BATCH)
    rng = np.random.RandomState(11)
    pool = rng.randn(48, 24).astype(np.float64)
    candidates = pool[rng.permutation(48)[:20]].copy()
    ref_picks = sel._max_representative_samples(pool, candidates, 9)

    from deep_active_semantic_segmentation_tpu.ops.distance import (
        max_representative)

    ours = np.asarray(max_representative(
        jnp.asarray(pool, jnp.float32), jnp.asarray(candidates, jnp.float32),
        9))
    assert list(ours) == list(ref_picks), (list(ours), list(ref_picks))



# ---------------------------------------------------------------------------
# MC dropout on a TRAINED model: rank agreement is measurable and must hold
# ---------------------------------------------------------------------------

def test_mc_dropout_rank_agreement_on_trained_model():
    """Round-2 verdict missing #2: on a random-init model ref-vs-ref MC
    rank correlation is itself ~0.25, so rank agreement is unmeasurable.
    Here the reference's own torch DeepLab is TRAINED on the learnable
    block-rule task (pixel acc ~0.8), where between-image entropy rises
    above the 20-step MC noise: measured ref-vs-ref Spearman 0.82-0.90 /
    top-8 0.875-1.0. Our scorer, on the transplanted weights, must land
    inside that band (measured: Spearman 0.81-0.83 / top-8 0.875 vs every
    reference seed; see BASELINE.md)."""
    import reference_loop as rl

    train = rl.make_learnable_records(20, seed=0, split="train")
    paths = sorted(train.keys())
    model, sd = rl.train_reference_deeplab(train, paths[:12], epochs=40,
                                           lr=0.02, mc_dropout=True)

    env = rb.FakeLmdbEnv(train, with_keys=True)
    pd = rb.import_reference("dataloaders.dataset.paths_dataset")
    mod = rb.import_reference("active_selection.mc_dropout")
    sel = mod.ActiveSelectionMCDropout(NUM_CLASSES, env, 64, BATCH)
    from torch.utils.data import DataLoader

    def ref_scores(seed):
        torch.manual_seed(seed)
        model.apply(lambda m: m.train()
                    if type(m) == torch.nn.Dropout2d else None)
        out = []
        for s in DataLoader(pd.PathsDataset(env, paths, 64,
                                            include_labels=True),
                            batch_size=BATCH, num_workers=0):
            maps = sel._get_vote_entropy_for_batch(model, s["image"],
                                                   s["label"])
            out.extend(float(torch.mean(m)) for m in maps)
        model.eval()
        return np.asarray(out)

    r1, r2 = ref_scores(1), ref_scores(2)
    ref_band = rb.spearman(r1, r2)
    # premise: on the trained model the reference agrees with itself
    assert ref_band > 0.7, ref_band

    from deep_active_semantic_segmentation_tpu import constants
    from deep_active_semantic_segmentation_tpu.data.store import MemoryStore
    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        apply_torch_weights, deeplab_state_dict_to_flax)
    from deep_active_semantic_segmentation_tpu.selection import kernels
    from deep_active_semantic_segmentation_tpu.selection.base import ModelBundle
    from deep_active_semantic_segmentation_tpu.selection.mc_dropout import (
        ActiveSelectionMCDropout)

    our_model = DeepLab(num_classes=NUM_CLASSES, backbone="mobilenet",
                        output_stride=16, mc_dropout=True)
    variables = our_model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               train=False)
    p, s = deeplab_state_dict_to_flax(
        {k: v.detach().numpy() for k, v in sd.items()}, "mobilenet")
    variables = apply_torch_weights(variables, p, s)
    bundle = ModelBundle(our_model, variables["params"],
                         variables["batch_stats"])

    our_sel = ActiveSelectionMCDropout(NUM_CLASSES, MemoryStore(dict(train)),
                                       64, BATCH)
    ours = []
    for i, batch in enumerate(our_sel._paths_loader(paths,
                                                    include_labels=True)):
        maps = kernels.mc_vote_entropy_maps(
            bundle.model, bundle.variables, jnp.asarray(batch["image"]),
            jnp.asarray(batch["label"]),
            jax.random.fold_in(jax.random.PRNGKey(42), i), NUM_CLASSES,
            constants.MC_STEPS, "dropout")
        ours.extend(np.asarray(jnp.mean(maps, axis=(1, 2)))[: batch["nvalid"]])
    ours = np.asarray(ours)

    for ref in (r1, r2):
        rho = rb.spearman(ours, ref)
        assert rho >= min(ref_band - 0.15, 0.75), (rho, ref_band)
        assert rho >= 0.6, rho
        top8 = rb.topk_overlap(np.argsort(-ours), np.argsort(-ref), 8)
        assert top8 >= 0.75, top8
    # entropy levels must also sit inside the MC noise band
    assert np.abs(ours - r1).mean() < 0.15, np.abs(ours - r1).mean()


def test_reference_coreset_pooling_crashes_below_kernel_size():
    """Documented divergence behind kernels.pooled_features' clamp: the
    reference's fixed F.avg_pool2d(64, 32) over deeplab decoder features
    (core_set.py:47,61) ERRORS whenever the feature map is smaller than
    the kernel — any crop below 257 (features = ceil(crop/4)) — while our
    clamped pooling works at every geometry and is a no-op at the
    canonical 513 crop (129^2 features >= 64)."""
    import pytest
    import torch.nn.functional as F

    small = torch.zeros(1, 16, 17, 17)    # deeplab features at crop 65
    with pytest.raises(Exception):
        F.avg_pool2d(small, (64, 64), 32)

    canonical = torch.zeros(1, 16, 129, 129)   # crop 513
    F.avg_pool2d(canonical, (64, 64), 32)      # reference's working regime
