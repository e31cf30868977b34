"""The canonical experiment scripts (test_scripts/*.sh) must stay parseable
by the drivers' CLI — they are the executable record of the reference's
blessed hyperparameters (reference test_scripts/*.sh x16, SURVEY.md
section 2.3 'Experiment scripts')."""

import glob
import os
import shlex

import pytest

from deep_active_semantic_segmentation_tpu.config import (
    add_common_flags, config_from_args)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "test_scripts", "*.sh")))

ACCURACY_MODES = ["accuracy", "gradient", "uncertain", "uncertain_gradient"]


def _commands():
    out = []
    for path in SCRIPTS:
        with open(path) as f:
            text = f.read().replace("\\\n", " ")
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("python "):
                out.append((os.path.basename(path), shlex.split(line)))
    return out


def test_scripts_exist_and_mirror_reference_count():
    assert len(SCRIPTS) == 16, SCRIPTS


@pytest.mark.parametrize("script,cmd", _commands(),
                         ids=[f"{s}:{c[1]}" for s, c in _commands()])
def test_script_flags_parse_and_finalize(script, cmd):
    import argparse

    driver = cmd[1]
    assert driver in ("active_train.py", "accuracy_predictor_train.py"), cmd
    parser = argparse.ArgumentParser()
    add_common_flags(parser, selection_choices=(
        ACCURACY_MODES if driver == "accuracy_predictor_train.py" else None))
    if driver == "accuracy_predictor_train.py":
        # driver extras (accuracy_predictor_train.py main)
        parser.add_argument("--weight-unet", type=float, default=0.30)
        parser.add_argument("--weight-wrong-label-unet", type=float,
                            default=0.75)
        parser.add_argument("--accuracy-selection", type=str,
                            default="softmax")
        parser.add_argument("--no-end-to-end", action="store_true")
        parser.add_argument("--symmetry", action="store_true")
    ns = parser.parse_args(cmd[2:])
    cfg = config_from_args(ns).finalize(n_devices=1)
    # the canonical hyperparameters the scripts encode (BASELINE.md)
    assert cfg.batch_size == 5
    assert cfg.max_iterations == 8
    if "cityscapes" in cfg.dataset:
        assert (cfg.epochs, cfg.lr, cfg.crop_size,
                cfg.active_batch_size) == (200, 0.01, 513, 125) or \
            cfg.active_selection_mode == "variance_representative"
    if "pascal" in cfg.dataset:
        assert (cfg.epochs, cfg.lr, cfg.base_size, cfg.crop_size) == \
            (150, 0.007, 512, -1)
        assert cfg.active_batch_size in (60, 120)  # repr. mode doubles it
    assert cfg.use_balanced_weights and cfg.memory_hog


def test_eval_twins_monitor_their_producers():
    """accuracy_eval jobs must point --monitor-directory at a producer
    checkname that some train job creates (the reference's twin-run
    pattern, cs_experiments_00e-01e.sh)."""
    producers, monitors = set(), []
    for _, cmd in _commands():
        args = dict(zip(cmd, cmd[1:]))
        name = args.get("--checkname")
        if args.get("--active-selection-mode") == "accuracy_eval":
            monitors.append(args.get("--monitor-directory"))
        elif name:
            producers.add(name)
    # every in-repo producer twin must be monitored consistently; monitors
    # for runs produced elsewhere (random/coreset eval twins) just need a
    # well-formed name
    for m in monitors:
        assert m and ("alefw_" in m or "evalpa_" in m), m
    for p in producers & set(monitors):
        assert p in producers


def test_bench_hotloop_names_resolve():
    """bench.py ships the hot-loop family numbers in its artifact extra
    (VERDICT r3 #1); every name it enumerates must resolve to a callable
    in tools/bench_hotloops.BENCHES so a rename can't silently turn the
    round's perf evidence into per-family error strings."""
    import bench
    from tools import bench_hotloops

    for name in bench.HOTLOOP_BENCHES:
        assert name in bench_hotloops.BENCHES, name
        assert callable(bench_hotloops.BENCHES[name])
