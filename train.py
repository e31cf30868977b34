"""Passive (full-supervision) trainer CLI.

Parity: reference train.py — plain supervised training on full
Cityscapes/Pascal with per-epoch validation, experiment_{n} run dirs, and
cross-experiment best-checkpoint promotion.
"""

import argparse
import random

from deep_active_semantic_segmentation_tpu.config import (
    add_common_flags, config_from_args)
from deep_active_semantic_segmentation_tpu.data import make_dataloader
from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh
from deep_active_semantic_segmentation_tpu.utils.checkpoint import (
    load_checkpoint)
from deep_active_semantic_segmentation_tpu.utils.saver import PassiveSaver
from deep_active_semantic_segmentation_tpu.utils.summaries import (
    TensorboardSummary)


def main(argv=None, dataset_root=None, runs_root=None):
    parser = argparse.ArgumentParser(description="TPU DeeplabV3Plus training")
    add_common_flags(parser)
    parser.add_argument("--resume-checkpoint", type=str, default=None,
                        help="checkpoint path to resume from")
    ns = parser.parse_args(argv)
    args = config_from_args(ns)
    if args.dataset not in ("cityscapes", "pascal"):
        parser.error("train.py drives the passive datasets: cityscapes|pascal")

    mesh = make_mesh(args.num_devices)
    cfg = args.finalize(n_devices=mesh.devices.size)
    print(cfg)
    random.seed(cfg.seed)

    train_set, train_loader, val_loader, _, nclass = make_dataloader(
        cfg.dataset, cfg.base_size, cfg.crop_size, cfg.batch_size,
        cfg.workers, cfg.overfit, memory_hog=cfg.memory_hog,
        dataset_root=dataset_root, seed=cfg.seed,
        device_normalize=cfg.uint8_wire)
    train_set.make_dataset_multiple_of_batchsize(cfg.batch_size)

    trainer = Trainer(cfg, train_loader, val_loader, nclass, mesh=mesh,
                      runs_root=runs_root,
                      train_grids=True)  # per-epoch train grid, train.py:134
    trainer.saver = PassiveSaver(cfg, runs_root=runs_root)
    trainer.saver.save_experiment_config()
    trainer.summary = TensorboardSummary(trainer.saver.experiment_dir)
    trainer.writer = trainer.summary.create_summary()
    trainer.initialize()

    start_epoch = cfg.start_epoch
    if ns.resume_checkpoint:
        from deep_active_semantic_segmentation_tpu.parallel.steps import (
            place_replicated)

        trainer.state, payload = load_checkpoint(ns.resume_checkpoint,
                                                 trainer.state)
        trainer.state = place_replicated(trainer.state, mesh)
        start_epoch = payload["epoch"]
        if not cfg.ft:
            trainer.best_pred = payload["best_pred"]
        print(f"=> loaded checkpoint {ns.resume_checkpoint} "
              f"(epoch {payload['epoch']})")

    print("Starting Epoch:", start_epoch)
    print("Total Epoches:", cfg.epochs)
    for epoch in range(start_epoch, cfg.epochs):
        trainer.training(epoch)
        if not cfg.no_val and epoch % cfg.eval_interval == cfg.eval_interval - 1:
            trainer.validation(epoch)
    trainer.writer.close()
    return trainer


if __name__ == "__main__":
    main()
