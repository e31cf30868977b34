"""Region-mode head-to-head vs the ACTUAL reference outer loop.

The round-3 image-mode head-to-head (test_loop_head_to_head.py) left one
seam untested: REGION accumulation across rounds — per-path region
OrderedDicts, masked-target serving, labeled-pixel accounting, and the
suppression of already-labeled boxes feeding the next round's selection
(reference active_train.py:459-464 + region_cityscapes.py). Here the
reference's region loop runs for real (tests/reference_loop.py:
run_reference_region_loop — its ActiveCityscapesRegion pool, its torch
trainer, its MC-dropout create_region_maps) against our
``run_active_loop`` on the same records, seed set and loop config.

MC region maps are stochastic (20 dropout forwards), so the controlled
comparison is judged against the reference's OWN MC-seed-to-seed band
(same transplanted state, different torch seed) rather than an exact
box-sequence match — the same methodology as the trained-model MC rank
agreement test (test_reference_agreement.py).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import reference_loop as rl

CROP = 64
BATCH = 4
RS = 16            # active region size
ABS = 1            # active batch size -> ceil(1*64^2/16^2) = 16 boxes/round
N_TRAIN, N_VAL = 16, 6
EPOCHS = 4
EVAL_INTERVAL = 2
ROUNDS = 3
NCLS = 19


@pytest.fixture(scope="module")
def records():
    return (rl.make_learnable_records(N_TRAIN, seed=0, split="train"),
            rl.make_learnable_records(N_VAL, seed=99, split="val"))


@pytest.fixture(scope="module")
def seed_paths(records):
    return sorted(records[0].keys())[:2]


@pytest.fixture(scope="module")
def ref_out(records, seed_paths, tmp_path_factory):
    train, val = records
    tmp = str(tmp_path_factory.mktemp("refregionloop"))
    ds_dir = rl.write_reference_dataset_dir(tmp, seed_paths)
    return rl.run_reference_region_loop(
        train, val, ds_dir, crop_size=CROP, batch_size=BATCH,
        region_size=RS, active_batch_size=ABS, max_iterations=ROUNDS,
        epochs=EPOCHS, eval_interval=EVAL_INTERVAL)


def _write_our_dataset(root, train, val, seed_paths):
    from deep_active_semantic_segmentation_tpu.data.store import DirectoryStore

    for split, records in [("train", train), ("val", val)]:
        store = DirectoryStore(os.path.join(root, "cityscapes", split),
                               readonly=False)
        keys = sorted(records.keys())
        for k in keys:
            store.put(k, records[k])
        store.finalize(keys)
    seed_dir = os.path.join(root, "cityscapes", "seed_sets")
    os.makedirs(seed_dir, exist_ok=True)
    with open(os.path.join(seed_dir, "set_0.txt"), "w") as f:
        for k in seed_paths:
            f.write(k.decode() + "\n")


def test_region_loop_trajectory_and_accounting(ref_out, records, seed_paths,
                                               tmp_path):
    """Free-running region loops: identical %labeled schedules (the pixel
    accounting is deterministic once both NMS passes fill the request),
    rising mIoU on both sides."""
    from deep_active_semantic_segmentation_tpu.config import ExperimentConfig
    from deep_active_semantic_segmentation_tpu.engine.active_loop import (
        run_active_loop)
    from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh

    train, val = records
    root = str(tmp_path / "data")
    _write_our_dataset(root, train, val, seed_paths)
    cfg = ExperimentConfig(
        architecture="deeplab", backbone="mobilenet", out_stride=16,
        dataset="active_cityscapes_region", base_size=CROP, crop_size=CROP,
        epochs=EPOCHS, batch_size=BATCH, test_batch_size=BATCH, lr=0.01,
        use_lr_scheduler=True, eval_interval=EVAL_INTERVAL, seed=1,
        active_batch_size=ABS, active_region_size=RS,
        max_iterations=ROUNDS, checkname="h2h-region",
        active_selection_mode="variance", no_early_stop=True,
        workers=0).finalize(n_devices=1)
    ours = run_active_loop(cfg, mesh=make_mesh(1), dataset_root=root,
                           runs_root=str(tmp_path / "runs"))

    ref_hist = {k: v["mIoU"] for k, v in ref_out["history"].items()}
    our_hist = {k: v["mIoU"] for k, v in ours.items()}
    # identical labeled-fraction schedule: seed regions + counts*rs^2
    # accounting must agree round for round
    assert sorted(ref_hist) == sorted(our_hist), (ref_hist, our_hist)

    fr = sorted(ref_hist)
    assert ref_hist[fr[-1]] > ref_hist[fr[0]], ref_hist
    assert our_hist[fr[-1]] > our_hist[fr[0]], our_hist
    for f in fr:
        assert abs(ref_hist[f] - our_hist[f]) < 0.25, (f, ref_hist, our_hist)

    # both fill the full per-round box request (16 at this config) —
    # precondition for the schedule equality above to be meaningful
    assert all(c == 16 for c in ref_out["counts"]), ref_out["counts"]


def _spearman(a, b):
    import reference_bridge as rb

    return rb.spearman(np.asarray(a).ravel(), np.asarray(b).ravel())


def test_controlled_region_maps_within_reference_band(ref_out, records):
    """Controlled variant at the SCORE-MAP level: per round, the
    reference's best checkpoint is transplanted into our model and OUR MC
    region pipeline computes the pre-NMS box-sum maps (entropy sweep ->
    labeled-region suppression -> box filter) from the reference's own
    existing-region state. Per-box Spearman vs the reference's maps must
    sit inside the reference's OWN MC-seed-to-seed band (same state,
    different torch seed).

    Box-level NMS output is deliberately NOT the metric: measured
    ref-vs-ref box agreement across MC seeds is 0.06-0.5 at this scale —
    greedy NMS amplifies seed noise into different selection paths, so
    box sets are not a stable statistic even for the reference against
    itself (the NMS itself is exact-tested on fixed maps in
    test_reference_agreement.py)."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.data.store import MemoryStore
    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        apply_torch_weights, deeplab_state_dict_to_flax)
    from deep_active_semantic_segmentation_tpu.ops import region as region_ops
    from deep_active_semantic_segmentation_tpu.selection.base import ModelBundle
    from deep_active_semantic_segmentation_tpu.selection.mc_dropout import (
        ActiveSelectionMCDropout)

    train, _ = records
    store = MemoryStore(dict(train))
    image_paths = list(ref_out["image_paths"])
    model = DeepLab(num_classes=NCLS, backbone="mobilenet", output_stride=16,
                    mc_dropout=True)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, CROP, CROP, 3), jnp.float32),
                           train=False)

    def our_box_maps(vs, existing, seed):
        sel = ActiveSelectionMCDropout(NCLS, store, CROP, BATCH)
        bundle = ModelBundle(model=model, params=vs["params"],
                             batch_stats=vs["batch_stats"])
        scorer = sel._entropy_scorer(bundle, jax.random.PRNGKey(seed))
        loader = sel._paths_loader(image_paths, include_labels=True,
                                   labels_as_mask=NCLS)
        out, ctr = [], 0
        for batch in loader:
            maps = scorer(batch)
            n = batch["nvalid"]
            regs = [existing[ctr + i] if ctr + i < len(image_paths) else []
                    for i in range(maps.shape[0])]
            if any(regs):
                mult = np.stack([region_ops.suppression_multiplier(
                    maps.shape[1:3], r) for r in regs])
                maps = maps * jnp.asarray(mult)
            out.append(np.asarray(
                region_ops.box_sum_valid(maps, RS))[:n])
            ctr += n
        return np.concatenate(out)

    assert len(ref_out["regions"]) == ROUNDS - 1
    for rnd, (sd, existing) in enumerate(zip(ref_out["best_state_dicts"],
                                             ref_out["existing_before"])):
        # refA replays the torch seed the loop's actual selection consumed
        refA = rl.reference_region_score_maps(
            sd, train, image_paths, existing, RS, crop_size=CROP,
            batch_size=BATCH, num_classes=NCLS, torch_seed=rnd)
        refB = rl.reference_region_score_maps(
            sd, train, image_paths, existing, RS, crop_size=CROP,
            batch_size=BATCH, num_classes=NCLS, torch_seed=777 + rnd)

        np_sd = {k: v.detach().numpy() for k, v in sd.items()}
        p, s = deeplab_state_dict_to_flax(np_sd, "mobilenet")
        vs = apply_torch_weights(variables, p, s)
        ours = our_box_maps(vs, existing, seed=1000 + rnd)

        band = _spearman(refA, refB)
        got = _spearman(ours, refA)
        # measured: round 0 band 0.48 / ours 0.51; round 1 band 0.80 /
        # ours 0.75 — inside the reference's own seed-to-seed spread
        assert got >= band - 0.15, (rnd, got, band)
        assert band > 0.3, (rnd, band)   # premise: maps carry signal
