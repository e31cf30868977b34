"""Checkpoint evaluation / visualization CLI.

Parity: reference visualize.py:19-159 — load a checkpoint, run the val
set, dump per-image img/tgt/pred PNGs next to the checkpoint, print
Acc / Acc_class / mIoU / FWIoU.
"""

import argparse
import os

import numpy as np

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.config import (
    add_common_flags, config_from_args)
from deep_active_semantic_segmentation_tpu.data import make_dataloader
from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
from deep_active_semantic_segmentation_tpu.ops.metrics import Evaluator
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh
from deep_active_semantic_segmentation_tpu.utils.checkpoint import (
    load_checkpoint)
from deep_active_semantic_segmentation_tpu.utils.summaries import (
    TensorboardSummary)


def main(argv=None, dataset_root=None):
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
        memory_hog=cfg.memory_hog, dataset_root=dataset_root, seed=cfg.seed)

    trainer = Trainer(cfg, train_loader, val_loader, nclass, mesh=mesh)
    trainer.initialize()
    trainer.state, payload = load_checkpoint(ns.checkpoint, trainer.state)
    print(f"=> loaded checkpoint {ns.checkpoint} (epoch {payload['epoch']})")

    vis_folder = os.path.join(os.path.dirname(os.path.realpath(ns.checkpoint)),
                              constants.VISUALIZATIONS_FOLDER)
    os.makedirs(vis_folder, exist_ok=True)

    evaluator = Evaluator(nclass)
    test_loss = 0.0
    for i, batch in enumerate(val_loader):
        out = trainer.eval_step(trainer.state,
                                {"image": batch["image"],
                                 "label": batch["label"]},
                                np.float32(batch["nvalid"]))
        test_loss += float(out["loss"])
        pred = np.asarray(out["pred"])[: batch["nvalid"]]
        target = np.asarray(batch["label"])[: batch["nvalid"]]
        evaluator.add_batch(target, pred)
        TensorboardSummary.visualize_images_to_folder(
            vis_folder, i, batch["image"][: batch["nvalid"]], target, pred,
            cfg.dataset)

    print("\nEvaluation:")
    print("Acc:{}, Acc_class:{}, mIoU:{}, fwIoU: {}".format(
        evaluator.Pixel_Accuracy(), evaluator.Pixel_Accuracy_Class(),
        evaluator.Mean_Intersection_over_Union(),
        evaluator.Frequency_Weighted_Intersection_over_Union()))
    print("Loss: %.3f" % test_loss)


if __name__ == "__main__":
    main()
