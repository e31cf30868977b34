"""Checkpoint evaluation / visualization CLI.

Parity: reference visualize.py:19-159 — load a checkpoint, run the val
set, dump per-image img/tgt/pred PNGs next to the checkpoint, print
Acc / Acc_class / mIoU / FWIoU. Evaluation runs through the shared
prefetched/mesh-placed path (engine/evaluation.py).
"""

import argparse
import os

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.config import (
    add_common_flags, config_from_args)
from deep_active_semantic_segmentation_tpu.data import make_dataloader
from deep_active_semantic_segmentation_tpu.engine.evaluation import (
    evaluate_checkpoint)
from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh


def main(argv=None, dataset_root=None):
    """Returns the metrics dict (epoch/loss/Acc/Acc_class/mIoU/FWIoU) —
    printed reference-style below, returned for the driver test
    (tests/test_drivers.py::test_visualize_driver)."""
    parser = argparse.ArgumentParser(description="TPU DeeplabV3Plus visualize")
    add_common_flags(parser)
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="checkpoint path to evaluate")
    ns = parser.parse_args(argv)
    args = config_from_args(ns)
    mesh = make_mesh(args.num_devices)
    cfg = args.finalize(n_devices=mesh.devices.size)

    _, train_loader, val_loader, _, nclass = make_dataloader(
        cfg.dataset, cfg.base_size, cfg.crop_size, cfg.batch_size,
        cfg.workers, cfg.overfit, init_set=cfg.seed_set,
        memory_hog=cfg.memory_hog, dataset_root=dataset_root, seed=cfg.seed,
        device_normalize=cfg.uint8_wire)

    trainer = Trainer(cfg, train_loader, val_loader, nclass, mesh=mesh)
    trainer.initialize()

    vis_folder = os.path.join(os.path.dirname(os.path.realpath(ns.checkpoint)),
                              constants.VISUALIZATIONS_FOLDER)
    os.makedirs(vis_folder, exist_ok=True)

    m = evaluate_checkpoint(trainer, ns.checkpoint, vis_folder=vis_folder)
    print(f"=> loaded checkpoint {ns.checkpoint} (epoch {m['epoch']})")
    print("\nEvaluation:")
    print("Acc:{}, Acc_class:{}, mIoU:{}, fwIoU: {}".format(
        m["Acc"], m["Acc_class"], m["mIoU"], m["FWIoU"]))
    print("Loss: %.3f" % m["loss"])
    return m


if __name__ == "__main__":
    main()
