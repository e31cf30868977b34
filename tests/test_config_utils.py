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


def test_throughput_counter_and_trace():
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.utils import profiling

    t = profiling.Throughput(num_chips=2)
    t.start()
    t.mark(8, result=jnp.ones((4,)))
    t.mark(8, result=jnp.ones(()))
    assert t.items_per_sec > 0
    assert abs(t.items_per_sec_per_chip - t.items_per_sec / 2) < 1e-9
    assert "imgs/s" in t.summary()
    with profiling.trace(None):  # no-op path
        pass


def test_converter_cli_roundtrip(tmp_path):
    import numpy as np
    from PIL import Image

    from deep_active_semantic_segmentation_tpu.data import convert
    from deep_active_semantic_segmentation_tpu.data.store import open_store

    # minimal fake cityscapes tree (reference cityscapes_to_lmdb.py layout)
    root = str(tmp_path / "cs")
    img_dir = os.path.join(root, "leftImg8bit", "val", "town")
    lab_dir = os.path.join(root, "gtFine_trainvaltest", "gtFine", "val", "town")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (20, 30, 3), dtype=np.uint8)).save(
        os.path.join(img_dir, "town_000000_000019_leftImg8bit.png"))
    Image.fromarray(rng.choice([7, 8, 0, 26], size=(20, 30)).astype(np.uint8)
                    ).save(os.path.join(
                        lab_dir, "town_000000_000019_gtFine_labelIds.png"))
    out = str(tmp_path / "val")
    convert.main(["cityscapes", root, "val", out])
    store = open_store(out)
    assert len(store.keys()) == 1
    rec = np.asarray(store.get(store.keys()[0]))
    assert rec.shape == (20, 30, 4)
    # remap: 7 -> trainId 0, 8 -> 1, 26 -> 13, void 0 -> 255
    labels = set(np.unique(rec[:, :, 3]))
    assert labels <= {0, 1, 13, 255}


def test_converter_emits_reproducible_seed_set(tmp_path):
    """Train-split conversions also write seed_sets/set_0.txt (the
    reference ships these as repo artifacts — datasets/cityscapes/
    seed_sets/set_0.txt, 50 paths from create_initial_set.py:9; our
    converter emits them deterministically so a canonical run is
    reproducible from the conversion command alone)."""
    import numpy as np
    from PIL import Image

    from deep_active_semantic_segmentation_tpu.data import convert

    root = str(tmp_path / "cs")
    img_dir = os.path.join(root, "leftImg8bit", "train", "town")
    lab_dir = os.path.join(root, "gtFine_trainvaltest", "gtFine", "train",
                           "town")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (8, 10, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, f"town_{i:06d}_000019_leftImg8bit.png"))
        Image.fromarray(rng.choice([7, 8], size=(8, 10)).astype(np.uint8)
                        ).save(os.path.join(
                            lab_dir, f"town_{i:06d}_000019_gtFine_labelIds.png"))
    out = str(tmp_path / "ds" / "cityscapes" / "train")
    convert.main(["cityscapes", root, "train", out, "--seed-set-count", "4"])
    seed_path = str(tmp_path / "ds" / "cityscapes" / "seed_sets" / "set_0.txt")
    assert os.path.exists(seed_path)
    lines = [x.strip() for x in open(seed_path) if x.strip()]
    assert len(lines) == 4
    assert all(line.startswith("/leftImg8bit/train/town/") for line in lines)
    # deterministic: a second conversion emits the identical set
    out2 = str(tmp_path / "ds2" / "cityscapes" / "train")
    convert.main(["cityscapes", root, "train", out2, "--seed-set-count", "4"])
    lines2 = [x.strip() for x in
              open(str(tmp_path / "ds2" / "cityscapes" / "seed_sets" /
                       "set_0.txt")) if x.strip()]
    assert lines == lines2
