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


def test_active_loop_on_8_device_mesh(dataset_root, tmp_path):
    """Full AL round with the batch sharded over all 8 virtual devices —
    gradients/batch stats reduced by XLA collectives end to end."""
    runs = str(tmp_path / "runs")
    cfg = _base_config(active_selection_mode="ceal_entropy",
                       checkname="e2e-mesh8", batch_size=8,
                       test_batch_size=8, max_iterations=2)
    mesh = make_mesh()  # all 8 CPU devices
    assert mesh.devices.size == 8
    history = run_active_loop(cfg, mesh=mesh, dataset_root=dataset_root,
                              runs_root=runs)
    assert len(history) == 2
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


@pytest.mark.parametrize("arch", ["enet", "fastscnn"])
def test_active_loop_other_architectures(dataset_root, tmp_path, arch):
    """The AL loop end to end with the non-DeepLab model families
    (--architecture enet|fastscnn, reference active_train.py:51-58).
    crop 32: ENet's pool/unpool chain needs even sizes (as in the
    reference's 512-sized configs)."""
    runs = str(tmp_path / "runs")
    cfg = _base_config(architecture=arch, base_size=32, crop_size=32,
                       epochs=1, active_selection_mode="ceal_entropy",
                       checkname=f"e2e-{arch}", max_iterations=2)
    history = run_active_loop(cfg, mesh=make_mesh(1),
                              dataset_root=dataset_root, runs_root=runs)
    assert len(history) == 2
    exp_dir = os.path.join(runs, cfg.dataset, cfg.checkname)
    run_dirs = sorted(d for d in os.listdir(exp_dir) if d.startswith("run_"))
    sel = open(os.path.join(exp_dir, run_dirs[-1], "selections.txt")).readlines()
    assert len(sel) == 7
