"""Checkpoint-series eval sweep CLI.

Parity: ``get_validation_mIoUs`` in reference
active_selection/tests.py:32-101 — given an active-learning experiment
directory, re-validate every round's ``run_*/best.ckpt`` on the val split
and emit the mIoU-vs-%labeled table (the curve the AL-science workflow
plots). Writes ``validation_mIoUs.txt`` into the experiment directory.

Usage:
  python eval_series.py --dataset active_cityscapes_image --base-size 513 \
      --crop-size 513 --batch-size 5 --backbone mobilenet \
      --checkname <experiment name> [--dual-head] [--experiment-dir DIR]
"""

import argparse
import os

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.config import (
    add_common_flags, config_from_args)
from deep_active_semantic_segmentation_tpu.data import make_dataloader
from deep_active_semantic_segmentation_tpu.engine.evaluation import (
    evaluate_checkpoint_series)
from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh


def main(argv=None, dataset_root=None, runs_root=None):
    parser = argparse.ArgumentParser(
        description="Re-validate an AL run's per-round checkpoints")
    add_common_flags(parser)
    parser.add_argument("--experiment-dir", type=str, default=None,
                        help="explicit experiment directory (default: "
                             "<runs>/<dataset>/<checkname>)")
    parser.add_argument("--ckpt-name", type=str, default="best.ckpt")
    parser.add_argument("--dual-head", action="store_true", default=False,
                        help="evaluate accuracy-predictor checkpoints "
                             "(seg + error head, tests.py:88-96)")
    ns = parser.parse_args(argv)
    args = config_from_args(ns)
    mesh = make_mesh(args.num_devices)
    cfg = args.finalize(n_devices=mesh.devices.size)

    experiment_dir = ns.experiment_dir or os.path.join(
        runs_root or constants.RUNS, cfg.dataset, cfg.checkname)
    if not os.path.isdir(experiment_dir):
        raise FileNotFoundError(experiment_dir)

    _, train_loader, val_loader, _, nclass = make_dataloader(
        cfg.dataset, cfg.base_size, cfg.crop_size, cfg.batch_size,
        cfg.workers, cfg.overfit, init_set=cfg.seed_set,
        memory_hog=cfg.memory_hog, dataset_root=dataset_root, seed=cfg.seed,
        device_normalize=cfg.uint8_wire)

    trainer = Trainer(cfg, train_loader, val_loader, nclass, mesh=mesh,
                      dual_head=ns.dual_head)
    trainer.initialize()

    series = evaluate_checkpoint_series(trainer, experiment_dir,
                                        ckpt_name=ns.ckpt_name)
    if not series:
        raise FileNotFoundError(
            f"no run_*/{ns.ckpt_name} under {experiment_dir}")
    return series


if __name__ == "__main__":
    main()
