"""Config derived-default rules (reference active_train.py:299-343) and
misc utilities (early stop, class weights, savers, seed tools)."""

import os

import numpy as np

from deep_active_semantic_segmentation_tpu.config import (
    ExperimentConfig, parse_cli)
from deep_active_semantic_segmentation_tpu.utils.class_weights import (
    calculate_weights_labels)
from deep_active_semantic_segmentation_tpu.utils.early_stop import (
    EarlyStopChecker)
from deep_active_semantic_segmentation_tpu.utils.saver import (
    ActiveSaver, PassiveSaver)
from deep_active_semantic_segmentation_tpu.utils.seed_tools import (
    create_initial_set, write_seed_set)


def test_finalize_auto_defaults():
    cfg = ExperimentConfig(dataset="active_cityscapes_image").finalize(2)
    assert cfg.epochs == 200            # active_train.py:307-313
    assert cfg.batch_size == 8          # 4 * n_devices
    assert abs(cfg.lr - 0.01 / 8 * 8) < 1e-12
    assert cfg.sync_bn is True          # auto: multi-device
    assert cfg.checkname == "deeplab-resnet"

    cfg1 = ExperimentConfig(dataset="active_pascal_image").finalize(1)
    assert cfg1.epochs == 50 and cfg1.sync_bn is False
    assert abs(cfg1.lr - 0.007) < 1e-12


def test_variance_representative_doubles_active_batch():
    cfg = ExperimentConfig(active_selection_mode="variance_representative",
                           active_batch_size=50).finalize(1)
    assert cfg.active_batch_size == 100  # active_train.py:334
    assert cfg.mc_dropout is True


def test_cli_flag_names_match_reference():
    cfg = parse_cli(["--backbone", "mobilenet", "--out-stride", "8",
                     "--active-selection-mode", "variance",
                     "--active-batch-size", "125", "--memory-hog",
                     "--use-balanced-weights", "--min-improvement", "0.0025"])
    assert cfg.backbone == "mobilenet" and cfg.out_stride == 8
    assert cfg.active_batch_size == 125 and cfg.memory_hog
    assert cfg.use_balanced_weights and cfg.min_improvement == 0.0025


def test_early_stop_reference_semantics():
    es = EarlyStopChecker(patience=2, min_improvement=0.01)
    assert not es(0.5)       # big improvement resets
    assert not es(0.505)     # below min_improvement -> counter 1
    assert es(0.505)         # counter 2 == patience -> stop


def test_class_weights_formula():
    loader = [{"label": np.array([[0, 0, 1, 255]])},
              {"label": np.array([[1, 1, 2, 2]])}]
    w = calculate_weights_labels(loader, 3)
    z = np.log(np.array([2.0, 3.0, 2.0]))
    expected = np.nan_to_num(1 / np.log(1.02 + z / z.sum()))
    assert np.allclose(w, expected)


def test_savers_layout(tmp_path):
    cfg = ExperimentConfig(dataset="active_cityscapes_image",
                           checkname="layout").finalize(1)
    runs = str(tmp_path)
    a = ActiveSaver(cfg, 42, runs_root=runs)
    a.save_experiment_config()
    a.save_active_selections([b"/a.png", b"/b.png"],
                             regions=[[(0, 0, 9, 9)], [(1, 2, 9, 9), (3, 4, 9, 9)]])
    sel = open(os.path.join(a.experiment_dir, "selections.txt")).read()
    assert sel == "/a.png,0,0,9,9\n/b.png,1,2,9,9,3,4,9,9\n"
    assert a.experiment_dir.endswith("run_0042")

    p1 = PassiveSaver(cfg, runs_root=runs)
    assert p1.experiment_dir.endswith("experiment_0")
    p2 = PassiveSaver(cfg, runs_root=runs)
    assert p2.experiment_dir.endswith("experiment_1")


def test_seed_tools(tmp_path):
    keys = [f"/img_{i}.png" for i in range(100)]
    picked = create_initial_set(keys, count=50, seed=0)
    assert len(picked) == 50 and len(set(picked)) == 50
    out = tmp_path / "seed_sets" / "set_0.txt"
    write_seed_set(str(out), picked)
    assert open(out).read().count("\n") == 50
