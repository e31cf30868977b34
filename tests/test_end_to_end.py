"""End-to-end active-learning loops on a tiny synthetic dataset —
the "minimum end-to-end slice" of SURVEY.md section 7 (BASELINE.json
configs[0]-style, CPU-runnable), exercising every layer thin."""

import os

import numpy as np
import pytest

from deep_active_semantic_segmentation_tpu.config import ExperimentConfig
from deep_active_semantic_segmentation_tpu.data.store import DirectoryStore
from deep_active_semantic_segmentation_tpu.engine.active_loop import (
    run_active_loop)
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh

CROP = 33
N_TRAIN, N_VAL = 12, 4


def _write_store(root, split, n, seed):
    rng = np.random.RandomState(seed)
    store = DirectoryStore(os.path.join(root, "cityscapes", split),
                           readonly=False)
    keys = []
    for i in range(n):
        img = rng.randint(0, 255, size=(40, 64, 3), dtype=np.uint8)
        lab = rng.randint(0, 19, size=(40, 64)).astype(np.uint8)
        key = f"/leftImg8bit/{split}/city/img_{i:03d}.png".encode()
        store.put(key, np.dstack((img, lab)))
        keys.append(key)
    store.finalize(keys)
    return keys


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    keys = _write_store(root, "train", N_TRAIN, 0)
    _write_store(root, "val", N_VAL, 1)
    seed_dir = os.path.join(root, "cityscapes", "seed_sets")
    os.makedirs(seed_dir)
    with open(os.path.join(seed_dir, "set_0.txt"), "w") as f:
        for k in keys[:4]:
            f.write(k.decode() + "\n")
    return root


def _base_config(**overrides):
    cfg = ExperimentConfig(
        architecture="deeplab", backbone="mobilenet", out_stride=16,
        dataset="active_cityscapes_image", base_size=CROP, crop_size=CROP,
        epochs=2, batch_size=2, test_batch_size=2, lr=0.01,
        use_lr_scheduler=True, eval_interval=1, seed=1,
        active_batch_size=3, max_iterations=2, checkname="e2e",
        no_early_stop=True, workers=0)
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg.finalize(n_devices=1)


def test_active_loop_ceal_entropy(dataset_root, tmp_path):
    runs = str(tmp_path / "runs")
    cfg = _base_config(active_selection_mode="ceal_entropy")
    mesh = make_mesh(1)
    history = run_active_loop(cfg, mesh=mesh, dataset_root=dataset_root,
                              runs_root=runs)
    assert len(history) == 2

    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    assert len(run_dirs) == 2
    # seed round: 4 labeled; second round: 4 + 3 selections
    sel0 = open(os.path.join(exp_dir, run_dirs[0], "selections.txt")).readlines()
    sel1 = open(os.path.join(exp_dir, run_dirs[1], "selections.txt")).readlines()
    assert len(sel0) == 4 and len(sel1) == 7
    assert set(sel0) <= set(sel1)
    assert os.path.exists(os.path.join(exp_dir, run_dirs[0], "best.ckpt"))
    assert os.path.exists(os.path.join(exp_dir, run_dirs[0], "parameters.txt"))
    for metrics in history.values():
        assert 0.0 <= metrics["mIoU"] <= 1.0


def test_active_loop_variance_region(dataset_root, tmp_path):
    runs = str(tmp_path / "runs")
    cfg = _base_config(dataset="active_cityscapes_region",
                       active_selection_mode="variance",
                       active_region_size=9, active_batch_size=1,
                       checkname="e2e-region")
    mesh = make_mesh(1)
    history = run_active_loop(cfg, mesh=mesh, dataset_root=dataset_root,
                              runs_root=runs)
    assert len(history) >= 1
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    # region-mode selections.txt has path,r,c,h,w lines (saver.py:72-75)
    last = open(os.path.join(exp_dir, run_dirs[-1], "selections.txt")).readlines()
    assert any(line.count(",") >= 4 for line in last)


def test_active_loop_resume_from_selections(dataset_root, tmp_path):
    runs = str(tmp_path / "runs")
    cfg = _base_config(active_selection_mode="random", checkname="e2e-resume")
    mesh = make_mesh(1)
    run_active_loop(cfg, mesh=mesh, dataset_root=dataset_root, runs_root=runs)
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    last_sel = os.path.join(exp_dir, run_dirs[-1], "selections.txt")
    # resume round 1 replaying the recorded selections (active_train.py:364-369)
    cfg2 = _base_config(active_selection_mode="random",
                        checkname="e2e-resume", resume=1,
                        resume_selections=os.path.join(run_dirs[-1],
                                                       "selections.txt"))
    history = run_active_loop(cfg2, mesh=mesh, dataset_root=dataset_root,
                              runs_root=runs)
    assert len(history) == 1


def _run_loop_collect_selections(dataset_root, runs, cfg, mesh):
    history = run_active_loop(cfg, mesh=mesh, dataset_root=dataset_root,
                              runs_root=runs)
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    sels = [open(os.path.join(exp_dir, d, "selections.txt")).readlines()
            for d in run_dirs]
    return history, sels


def test_active_loop_on_8_device_mesh_matches_mesh1(dataset_root, tmp_path):
    """Full AL loop on ALL 8 virtual devices vs the same loop on 1 device
    (VERDICT r4 missing #2): the loop-level interactions — pool padding x
    batch sharding x nvalid accounting x per-round labeled-set growth on a
    sharded loader — must reproduce the single-device run's selections
    exactly. Deterministic scoring mode (ceal_entropy, one forward per
    image, no MC draws) and f32 train compute, so the only cross-mesh
    difference is the collectives' f32 reduction order — far below the
    inter-image score separation. (Sharded-vs-unsharded MC scoring has its
    own score-level seed contract in test_sharded_scoring.py; here the
    contract is the LOOP.) Replaces reference DataParallel
    active_train.py:83-85."""
    cfg1 = _base_config(active_selection_mode="ceal_entropy",
                        checkname="e2e-mesh-cmp", batch_size=8,
                        test_batch_size=8, dtype="float32",
                        max_iterations=2)
    h1, s1 = _run_loop_collect_selections(
        dataset_root, str(tmp_path / "m1"), cfg1, make_mesh(1))

    mesh = make_mesh()  # all 8 CPU devices
    assert mesh.devices.size == 8
    cfg8 = _base_config(active_selection_mode="ceal_entropy",
                        checkname="e2e-mesh-cmp", batch_size=8,
                        test_batch_size=8, dtype="float32",
                        max_iterations=2)
    h8, s8 = _run_loop_collect_selections(
        dataset_root, str(tmp_path / "m8"), cfg8, mesh)

    assert len(h8) == len(h1) == 2
    # identical labeled-set bookkeeping AND identical picks, every round
    assert [sorted(r) for r in s8] == [sorted(r) for r in s1]
    for metrics in h8.values():
        assert 0.0 <= metrics["mIoU"] <= 1.0


def test_active_loop_mesh8_variance_region(dataset_root, tmp_path):
    """MC variance scoring + one REGION round on the full 8-device mesh:
    sharded train step + (batch %% 8 == 0) sharded MC region scoring +
    device NMS + region-pool bookkeeping all compose end to end (VERDICT
    r4 missing #2's region half). MC draws are per-shard decorrelated
    (kernels._sharded_mc_fn folds the shard index), so selections aren't
    compared against a 1-device run here — the score-level sharded-vs-
    unsharded contract lives in test_sharded_scoring.py."""
    runs = str(tmp_path / "runs")
    cfg = _base_config(dataset="active_cityscapes_region",
                       active_selection_mode="variance",
                       active_region_size=9, active_batch_size=1,
                       batch_size=8, test_batch_size=8,
                       checkname="e2e-mesh8-region")
    mesh = make_mesh()
    assert mesh.devices.size == 8
    history = run_active_loop(cfg, mesh=mesh, dataset_root=dataset_root,
                              runs_root=runs)
    assert len(history) >= 1
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    last = open(os.path.join(exp_dir, run_dirs[-1],
                             "selections.txt")).readlines()
    assert any(line.count(",") >= 4 for line in last)
    for metrics in history.values():
        assert 0.0 <= metrics["mIoU"] <= 1.0


def test_training_actually_learns(tmp_path):
    """Learnable synthetic task: the label is a deterministic function of
    color. A few epochs must push mIoU far above chance — catches silent
    optimizer/BN/loss breakage that loss-goes-down tests miss."""
    import jax

    from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer

    root = str(tmp_path / "learn")
    rng = np.random.RandomState(0)
    for split, n in [("train", 12), ("val", 4)]:
        store = DirectoryStore(os.path.join(root, "cityscapes", split),
                               readonly=False)
        keys = []
        for i in range(n):
            lab = rng.randint(0, 4, size=(40, 64)).astype(np.uint8)
            img = np.stack([lab * 60 + 10, 255 - lab * 60,
                            np.full_like(lab, 128)], axis=-1).astype(np.uint8)
            k = f"/l/{split}/c/{i:02d}.png".encode()
            store.put(k, np.dstack((img, lab)))
            keys.append(k)
        store.finalize(keys)

    from deep_active_semantic_segmentation_tpu.data.pools import (
        CITYSCAPES, PassivePool)
    from deep_active_semantic_segmentation_tpu.data.loader import Loader
    from deep_active_semantic_segmentation_tpu.data.store import open_store

    # UNet: full-res skip connections make the color rule learnable at
    # 32x32 (FastSCNN/DeepLab at output-stride 8/16 cannot resolve
    # per-pixel labels at this toy resolution — same in the reference)
    cfg = ExperimentConfig(
        architecture="unet", dataset="cityscapes", base_size=32,
        crop_size=32, epochs=40, batch_size=4, lr=0.02, eval_interval=1,
        seed=0, checkname="learn", workers=0).finalize(1)
    train_pool = PassivePool(CITYSCAPES, open_store(
        os.path.join(root, "cityscapes", "train")), 32, 32, "train")
    val_pool = PassivePool(CITYSCAPES, open_store(
        os.path.join(root, "cityscapes", "val")), 32, 32, "val")
    trainer = Trainer(cfg, Loader(train_pool, 4, shuffle=True, seed=0),
                      Loader(val_pool, 4), 19, mesh=make_mesh(1))
    trainer.initialize()
    for epoch in range(cfg.epochs):
        trainer.training(epoch)
    _, miou, acc, _, _, _ = trainer.validation(cfg.epochs - 1)
    # 4 active classes out of 19; chance pixel accuracy ~0.25
    assert acc > 0.45, acc


def test_trainer_scan_steps_matches_single_steps(dataset_root):
    """cfg.scan_steps=k routes full k-batch windows through ONE fused
    lax.scan program (dispatch amortization, parallel/steps.py) and the
    epoch remainder through the single-step program. In f32 (where the
    scanned and standalone programs agree to ~1 ULP — see
    test_parallel.test_scan_steps_matches_sequential_singles for the
    two-dtype step-level contract) the per-epoch loss totals and final
    params must match the scan_steps=1 run tightly: this pins the WIRING
    (window grouping, remainder routing, stacked-metric flattening, step
    counting). 3 batches/epoch with k=2 exercises one scanned window AND
    the remainder path every epoch."""
    import jax

    from deep_active_semantic_segmentation_tpu.data.loader import Loader
    from deep_active_semantic_segmentation_tpu.data.pools import (
        CITYSCAPES, PassivePool)
    from deep_active_semantic_segmentation_tpu.data.store import open_store
    from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer

    def run(k):
        import random

        # the train transforms draw from python's GLOBAL rng
        # (RandomScaleCrop/flip/blur) — pin it so both runs see
        # identical augmentations
        random.seed(1234)
        cfg = ExperimentConfig(
            architecture="unet", dataset="cityscapes", base_size=32,
            crop_size=32, epochs=2, batch_size=4, lr=0.02, eval_interval=1,
            seed=3, checkname="scan", workers=0, dtype="float32",
            scan_steps=k).finalize(1)
        train_pool = PassivePool(CITYSCAPES, open_store(
            os.path.join(dataset_root, "cityscapes", "train")), 32, 32,
            "train")
        val_pool = PassivePool(CITYSCAPES, open_store(
            os.path.join(dataset_root, "cityscapes", "val")), 32, 32, "val")
        trainer = Trainer(cfg, Loader(train_pool, 4, shuffle=True, seed=0),
                          Loader(val_pool, 4), 19, mesh=make_mesh(1))
        trainer.initialize()
        assert (trainer.train_step_scan is not None) == (k > 1)
        losses = [trainer.training(e) for e in range(cfg.epochs)]
        return losses, trainer.state

    losses1, st1 = run(1)
    losses2, st2 = run(2)  # 12 imgs / batch 4 = 3 steps: scan(2) + single
    np.testing.assert_allclose(losses2, losses1, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert int(st2.step) == int(st1.step) == 6


def test_active_loop_pascal_letterbox(tmp_path):
    """Pascal family end to end with crop_size=-1: ScaleWithPadding
    letterbox training geometry, base-size labeled-pixel accounting, and
    the pool-scoring loader's hardcoded 512 letterbox
    (paths_dataset.py:16)."""
    root = str(tmp_path / "pdata")
    rng = np.random.RandomState(0)
    for split, n in [("train", 10), ("val", 2)]:
        store = DirectoryStore(os.path.join(root, "pascal", split),
                               readonly=False)
        keys = []
        for i in range(n):
            h, w = rng.randint(30, 50), rng.randint(40, 70)  # varied sizes
            img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
            lab = rng.randint(0, 21, size=(h, w)).astype(np.uint8)
            k = f"2007_{split}_{i:04d}".encode()
            store.put(k, np.dstack((img, lab)))
            keys.append(k)
        store.finalize(keys)
    seed_dir = os.path.join(root, "pascal", "seed_sets")
    os.makedirs(seed_dir)
    with open(os.path.join(seed_dir, "set_0.txt"), "w") as f:
        for k in keys[:0]:
            pass
    train_keys = DirectoryStore(os.path.join(root, "pascal", "train")).keys()
    with open(os.path.join(seed_dir, "set_0.txt"), "w") as f:
        for k in train_keys[:4]:
            f.write(k.decode() + "\n")

    cfg = _base_config(dataset="active_pascal_image", base_size=64,
                       crop_size=-1, active_selection_mode="ceal_entropy",
                       active_batch_size=2, checkname="e2e-pascal",
                       epochs=1)
    runs = str(tmp_path / "runs")
    history = run_active_loop(cfg, mesh=make_mesh(1), dataset_root=root,
                              runs_root=runs)
    assert len(history) == 2
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    sel = open(os.path.join(exp_dir, run_dirs[-1], "selections.txt")).readlines()
    assert len(sel) == 6


@pytest.mark.parametrize("arch,mode", [
    ("enet", "ceal_entropy"), ("fastscnn", "ceal_entropy"),
    # ENet + variance drives the MC scan with the fused parity-
    # decomposition tconv+argmax votes (ops/tconv_votes.py) and the
    # packed 1-bit mask wire through the whole loop
    ("enet", "variance"),
])
def test_active_loop_other_architectures(dataset_root, tmp_path, arch, mode):
    """The AL loop end to end with the non-DeepLab model families
    (--architecture enet|fastscnn, reference active_train.py:51-58).
    crop 32: ENet's pool/unpool chain needs even sizes (as in the
    reference's 512-sized configs)."""
    runs = str(tmp_path / "runs")
    cfg = _base_config(architecture=arch, base_size=32, crop_size=32,
                       epochs=1, active_selection_mode=mode,
                       checkname=f"e2e-{arch}-{mode}", max_iterations=2)
    history = run_active_loop(cfg, mesh=make_mesh(1),
                              dataset_root=dataset_root, runs_root=runs)
    assert len(history) == 2
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    sel = open(os.path.join(exp_dir, run_dirs[-1], "selections.txt")).readlines()
    assert len(sel) == 7


def test_active_loop_weak_labels_across_rounds(dataset_root, tmp_path,
                                               monkeypatch):
    """3-round ceal_entropy_weakly_labeled loop: the per-round weak-label
    bookkeeping (reference active_train.py:478-495) must (a) decay the
    entropy threshold by weak_label_threshold_decay each round, (b) clear
    the previous round's weak labels before adding new ones, and (c)
    subtract the round's selected images from the weak set."""
    from deep_active_semantic_segmentation_tpu.data import pools
    from deep_active_semantic_segmentation_tpu.selection import ceal as ceal_mod

    thresholds = []
    orig_weak = ceal_mod.ActiveSelectionCEAL.get_weakly_labeled_data

    def spy_weak(self, bundle, images, threshold, entropies=None):
        thresholds.append(threshold)
        # force a non-empty weak set regardless of model entropies so the
        # clear/subtract/serve paths are genuinely exercised
        return orig_weak(self, bundle, images, float("inf"), entropies)

    monkeypatch.setattr(ceal_mod.ActiveSelectionCEAL,
                        "get_weakly_labeled_data", spy_weak)

    events = []
    orig_clear = pools.ActiveImagePool.clear_weak_labels
    orig_add = pools.ActiveImagePool.add_weak_labels
    orig_expand = pools.ActiveImagePool.expand_training_set

    def spy_clear(self):
        events.append(("clear",))
        return orig_clear(self)

    def spy_add(self, predictions_dict):
        events.append(("add", set(predictions_dict.keys())))
        return orig_add(self, predictions_dict)

    def spy_expand(self, paths):
        events.append(("expand", set(paths)))
        return orig_expand(self, paths)

    monkeypatch.setattr(pools.ActiveImagePool, "clear_weak_labels", spy_clear)
    monkeypatch.setattr(pools.ActiveImagePool, "add_weak_labels", spy_add)
    monkeypatch.setattr(pools.ActiveImagePool, "expand_training_set", spy_expand)

    runs = str(tmp_path / "runs")
    cfg = _base_config(active_selection_mode="ceal_entropy_weakly_labeled",
                       max_iterations=3, active_batch_size=2,
                       weak_label_entropy_threshold=0.8,
                       weak_label_threshold_decay=0.1)
    history = run_active_loop(cfg, mesh=make_mesh(1),
                              dataset_root=dataset_root, runs_root=runs)
    assert len(history) == 3

    # (a) threshold decays round-over-round: 0.8, 0.7 for rounds 0, 1
    assert thresholds == pytest.approx([0.8, 0.7])

    # per selection round the order is: clear -> expand(selected) ->
    # add(weak) (active_loop.py:216-231); two selection rounds happen
    # (the last iteration never selects)
    kinds = [e[0] for e in events]
    assert kinds == ["clear", "expand", "add"] * 2

    # (b)+(c): each round's weak set is fresh and disjoint from that
    # round's selections
    for i in range(0, len(events), 3):
        selected = events[i + 1][1]
        weak = events[i + 2][1]
        assert len(selected) == 2
        assert selected.isdisjoint(weak)
        assert weak  # the spy forced a non-empty weak set


def test_active_loop_accuracy_eval_twin(dataset_root, tmp_path):
    """Two-loop in-process twin: an accuracy_eval consumer replays a
    producer's per-round selections from its run_{pct}/selections.txt
    (reference accuracy.py:185-197 + active_train.py:520-525)."""
    runs = str(tmp_path / "runs")
    producer = _base_config(active_selection_mode="ceal_entropy",
                            checkname="producer", max_iterations=3,
                            active_batch_size=2)
    run_active_loop(producer, mesh=make_mesh(1), dataset_root=dataset_root,
                    runs_root=runs)

    consumer = _base_config(active_selection_mode="accuracy_eval",
                            checkname="consumer", max_iterations=3,
                            active_batch_size=2,
                            monitor_directory="producer")
    history = run_active_loop(consumer, mesh=make_mesh(1),
                              dataset_root=dataset_root, runs_root=runs)
    assert len(history) == 3

    pdir = os.path.join(runs, producer.dataset, "producer")
    cdir = os.path.join(runs, consumer.dataset, "consumer")
    pruns = sorted(d for d in os.listdir(pdir) if d.startswith("run_"))
    cruns = sorted(d for d in os.listdir(cdir) if d.startswith("run_"))
    assert pruns == cruns and len(pruns) == 3
    for d in pruns:
        psel = open(os.path.join(pdir, d, "selections.txt")).readlines()
        csel = open(os.path.join(cdir, d, "selections.txt")).readlines()
        assert set(psel) == set(csel), d


@pytest.mark.parametrize("mode,abs_,grow", [
    ("coreset", 3, 3),
    # variance_representative doubles the batch before the halving
    # (reference active_train.py:334 / config.finalize) — request 2, MC
    # ranks 4 candidates, max-subset keeps 2; the doubled size also
    # shrinks the iteration budget, hence the smaller request here
    ("variance_representative", 2, 2),
    ("noise_variance", 3, 3),
])
def test_active_loop_remaining_dispatch_modes(dataset_root, tmp_path, mode,
                                              abs_, grow):
    """Loop-level e2e for the dispatch branches previously covered only by
    selector unit tests: core-set k-center (engine feeds BOTH labeled and
    remaining pools to the selector), variance_representative (MC ranking
    re-ranked by max-subset over candidates), and the combined
    feature-noise+dropout scorer. Asserts the monotone selections.txt
    growth contract for each (reference active_train.py:468-476)."""
    runs = str(tmp_path / "runs")
    cfg = _base_config(active_selection_mode=mode, active_batch_size=abs_,
                       checkname=f"e2e-{mode}")
    history = run_active_loop(cfg, mesh=make_mesh(1),
                              dataset_root=dataset_root, runs_root=runs)
    assert len(history) == 2
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    sel0 = open(os.path.join(exp_dir, run_dirs[0], "selections.txt")).readlines()
    sel1 = open(os.path.join(exp_dir, run_dirs[1], "selections.txt")).readlines()
    assert len(sel0) == 4 and len(sel1) == 4 + grow
    assert set(sel0) <= set(sel1)
    assert len(set(sel1)) == len(sel1)   # no duplicate labeling


def test_active_loop_orbax_backend(dataset_root, tmp_path, monkeypatch):
    """Full AL loop with the Orbax directory-checkpoint backend
    (DASS_CKPT_BACKEND=orbax): per-round best-checkpoint save + the
    engine's reload-best-before-selection path must work identically to
    the msgpack default (utils/checkpoint.py backend dispatch)."""
    monkeypatch.setenv("DASS_CKPT_BACKEND", "orbax")
    runs = str(tmp_path / "runs")
    cfg = _base_config(active_selection_mode="ceal_entropy",
                       checkname="e2e-orbax")
    history = run_active_loop(cfg, mesh=make_mesh(1),
                              dataset_root=dataset_root, runs_root=runs)
    assert len(history) == 2
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    # orbax checkpoints are directories
    assert os.path.isdir(os.path.join(exp_dir, run_dirs[0], "best.ckpt"))
    sel1 = open(os.path.join(exp_dir, run_dirs[1], "selections.txt")).readlines()
    assert len(sel1) == 7


def test_active_loop_pretrained_backbone_every_round(dataset_root, tmp_path,
                                                     monkeypatch):
    """--pretrained-weights wiring (reference default init behavior,
    mobilenet.py:130-157 + active_train.py:394): a torch backbone
    state_dict saved to disk must be transplanted into EVERY per-round
    fresh model, and the transplanted backbone must reproduce the torch
    backbone's features at init."""
    import jax
    import jax.numpy as jnp
    import torch

    from reference_bridge import build_reference_model
    from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer

    def _build():
        import torch.nn as nn
        from models.backbone import mobilenet
        return mobilenet.MobileNetV2(output_stride=16,
                                     batchnorm=nn.BatchNorm2d,
                                     mc_dropout=False, input_channels=3,
                                     pretrained=False)

    torch.manual_seed(7)
    tbackbone = build_reference_model(_build).eval()
    ckpt_path = str(tmp_path / "mobilenet_imagenet.pth")
    torch.save(tbackbone.state_dict(), ckpt_path)

    # spy: snapshot the freshly-initialized state after every initialize()
    snaps = []
    orig_init = Trainer.initialize

    def spy(self):
        orig_init(self)
        snaps.append((
            np.asarray(self.state.params["backbone"]["stem_conv"]["kernel"]),
            np.asarray(self.state.params["decoder"]["classifier"]["kernel"]),
            jax.tree_util.tree_map(np.asarray, self.state.params),
            jax.tree_util.tree_map(np.asarray, self.state.batch_stats),
        ))

    monkeypatch.setattr(Trainer, "initialize", spy)
    runs = str(tmp_path / "runs")
    cfg = _base_config(active_selection_mode="ceal_entropy",
                       checkname="e2e-pretrained",
                       pretrained_weights=ckpt_path)
    history = run_active_loop(cfg, mesh=make_mesh(1),
                              dataset_root=dataset_root, runs_root=runs)
    assert len(history) == 2
    # pre-loop init + one per round
    assert len(snaps) >= 3

    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        mobilenet_state_dict_to_flax)

    sd = {k: v.detach().numpy() for k, v in tbackbone.state_dict().items()}
    bp, _ = mobilenet_state_dict_to_flax(sd)
    want_stem = np.asarray(bp["stem_conv"]["kernel"])
    for stem, _, _, _ in snaps:
        np.testing.assert_allclose(stem, want_stem, rtol=0, atol=0)
    # each round's head is a FRESH random init (reference retrains from
    # scratch; only the backbone is pinned)
    assert not np.allclose(snaps[-1][1], snaps[-2][1])

    # round-2's fresh model reproduces the torch backbone's features
    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab

    model = DeepLab(num_classes=19, backbone="mobilenet", output_stride=16)
    _, _, params, stats = snaps[-1]
    x = np.random.RandomState(3).randn(1, CROP, CROP, 3).astype(np.float32)
    ours_high, ours_low = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False, backbone_only=True)
    with torch.no_grad():
        ref_high, ref_low = tbackbone(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(ours_high),
                               np.transpose(ref_high.numpy(), (0, 2, 3, 1)),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_low),
                               np.transpose(ref_low.numpy(), (0, 2, 3, 1)),
                               atol=2e-4, rtol=1e-4)


def test_no_pretrained_flag_skips_transplant(dataset_root, tmp_path):
    """cfg.pretrained=False gates the transplant even with a path set."""
    import torch

    from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
    from deep_active_semantic_segmentation_tpu.data import make_dataloader

    # an intentionally-bogus checkpoint: with pretrained=False it must
    # never be read
    ckpt_path = str(tmp_path / "bogus.pth")
    torch.save({"not": torch.zeros(1)}, ckpt_path)

    cfg = _base_config(pretrained_weights=ckpt_path, pretrained=False)
    _, train_loader, val_loader, _, nclass = make_dataloader(
        cfg.dataset, cfg.base_size, cfg.crop_size, cfg.batch_size,
        cfg.workers, dataset_root=dataset_root, seed=cfg.seed)
    trainer = Trainer(cfg, train_loader, val_loader, nclass,
                      mesh=make_mesh(1))
    trainer.initialize()  # would raise on the bogus checkpoint if read
    assert trainer._pretrained_trees is None


def test_active_loop_zero_recompiles_after_first_round(dataset_root, tmp_path,
                                                       monkeypatch):
    """SURVEY hard part #6: the AL loop retrains from scratch every round
    on a growing labeled set, and at canonical scale a recompile per round
    (train step, eval step, or scorer) would dominate the wall clock. The
    trainer builds its jitted steps ONCE (schedule geometry rides in as a
    traced operand) and selectors key their jit cache on the model config,
    so after the first full round NOTHING may hit the XLA backend compiler
    again — counted here via jax.monitoring's backend_compile events over
    a 3-round loop whose labeled/pool sizes change every round."""
    import jax

    from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer

    compiles = []

    def listener(event, **kw):
        if event.startswith("/jax/core/compile/backend_compile"):
            compiles.append(event)

    jax.monitoring.register_event_listener(listener)
    marks = []
    orig_init = Trainer.initialize

    def spy(self):
        marks.append(len(compiles))
        orig_init(self)

    monkeypatch.setattr(Trainer, "initialize", spy)
    try:
        cfg = _base_config(active_selection_mode="variance",
                           max_iterations=3, checkname="e2e-recompile")
        history = run_active_loop(cfg, mesh=make_mesh(1),
                                  dataset_root=dataset_root,
                                  runs_root=str(tmp_path / "runs"))
    finally:
        jax.monitoring.unregister_event_listener(listener)
    assert len(history) == 3
    # inits: pre-loop, round 0, round 1, round 2
    assert len(marks) == 4
    total = len(compiles)
    # round 0 (marks[1]..marks[2]) compiles everything; round 1
    # (marks[2]..marks[3]) — a FULL round: train epochs, validation,
    # checkpoint reload, pool scoring, expansion — must reuse every cache,
    # as must round 2 (marks[3]..end, train+val on a larger set again).
    assert marks[3] - marks[2] == 0, (
        f"round 1 recompiled {marks[3] - marks[2]} programs")
    assert total - marks[3] == 0, (
        f"round 2 recompiled {total - marks[3]} programs")
