"""Checkpoint evaluation shared by visualize.py and eval_series.py.

Parity: the eval loops of reference visualize.py:57-159 and the
checkpoint-series sweep ``get_validation_mIoUs`` in
active_selection/tests.py:32-101 (re-validate every AL round's best
checkpoint and build the mIoU-vs-%labeled table).

TPU notes: the checkpoint is re-placed on the mesh once
(``place_replicated``) and batches stream through the Trainer's
double-buffered sharded prefetch — the reference (and our round-1
visualize.py) paid an unoverlapped host->device transfer per batch, which
on a latency-bound link dominates eval time.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from deep_active_semantic_segmentation_tpu.ops.metrics import Evaluator
from deep_active_semantic_segmentation_tpu.parallel.steps import (
    place_replicated)
from deep_active_semantic_segmentation_tpu.utils.checkpoint import (
    load_checkpoint)
from deep_active_semantic_segmentation_tpu.utils.summaries import (
    TensorboardSummary)


def evaluate_checkpoint(trainer, ckpt_path: str,
                        vis_folder: Optional[str] = None) -> dict:
    """Load ``ckpt_path`` into the trainer and run the full val split.

    Returns {epoch, loss, Acc, Acc_class, mIoU, FWIoU} plus
    {UNetAcc, UNetmIoU} for dual-head trainers. When ``vis_folder`` is
    set, dumps per-image img/tgt/pred PNGs there (visualize.py parity).
    """
    trainer.state, payload = load_checkpoint(ckpt_path, trainer.state)
    if trainer.mesh is not None:
        trainer.state = place_replicated(trainer.state, trainer.mesh)

    evaluator = Evaluator(trainer.nclass)
    unet_evaluator = Evaluator(2) if trainer.dual_head else None
    test_loss = 0.0
    for i, batch in enumerate(trainer._prefetched(trainer.val_loader)):
        step_batch = {"image": batch["image"], "label": batch["label"]}
        if trainer.dual_head:
            out = trainer.eval_step(trainer.state, step_batch,
                                    np.float32(batch["nvalid"]),
                                    np.float32(1.0), np.float32(1.0))
            unet_evaluator.add_matrix(out["unet_confusion"])
        else:
            out = trainer.eval_step(trainer.state, step_batch,
                                    np.float32(batch["nvalid"]))
        test_loss += float(out["loss"])
        evaluator.add_matrix(out["confusion"])
        if vis_folder is not None and not trainer.dual_head:
            n = batch["nvalid"]
            target = np.asarray(batch["label"])[:n]
            pred = np.asarray(out["pred"])[:n]
            TensorboardSummary.visualize_images_to_folder(
                vis_folder, i, np.asarray(batch["image"])[:n], target, pred,
                trainer.args.dataset)

    result = {
        "epoch": payload.get("epoch"),
        "loss": test_loss,
        "Acc": evaluator.Pixel_Accuracy(),
        "Acc_class": evaluator.Pixel_Accuracy_Class(),
        "mIoU": evaluator.Mean_Intersection_over_Union(),
        "FWIoU": evaluator.Frequency_Weighted_Intersection_over_Union(),
    }
    if unet_evaluator is not None:
        result["UNetAcc"] = unet_evaluator.Pixel_Accuracy()
        result["UNetmIoU"] = unet_evaluator.Mean_Intersection_over_Union()
    return result


def discover_run_checkpoints(experiment_dir: str,
                             ckpt_name: str = "best.ckpt"):
    """Ordered [(labeled_pct, ckpt_path)] over an experiment's run_* dirs
    (the AL round layout, utils/saver.py / reference saver.py:43-78)."""
    out = []
    for entry in sorted(os.listdir(experiment_dir)):
        if not entry.startswith("run_"):
            continue
        path = os.path.join(experiment_dir, entry, ckpt_name)
        if os.path.exists(path):
            out.append((int(entry[len("run_"):]), path))
    return out


def evaluate_checkpoint_series(trainer, experiment_dir: str,
                               ckpt_name: str = "best.ckpt",
                               write_table: bool = True):
    """get_validation_mIoUs parity (tests.py:32-101): re-validate every AL
    round's checkpoint; returns {labeled_pct: metrics} and writes
    ``validation_mIoUs.txt`` next to the runs."""
    series = {}
    rows = []
    for pct, path in discover_run_checkpoints(experiment_dir, ckpt_name):
        metrics = evaluate_checkpoint(trainer, path)
        series[pct] = metrics
        extras = ""
        if "UNetAcc" in metrics:
            extras = (f", UNetAcc: {metrics['UNetAcc']}, "
                      f"UNetmIoU: {metrics['UNetmIoU']}")
        row = (f"run_{pct:04d}: Acc:{metrics['Acc']}, "
               f"Acc_class:{metrics['Acc_class']}, mIoU:{metrics['mIoU']}, "
               f"fwIoU: {metrics['FWIoU']}{extras}")
        print(row)
        rows.append(row)
    if write_table and rows:
        with open(os.path.join(experiment_dir, "validation_mIoUs.txt"),
                  "w") as f:
            f.write("\n".join(rows) + "\n")
    return series
