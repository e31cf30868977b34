"""Accuracy-predictor trainer CLI (two-headed model).

Parity: reference accuracy_predictor_train.py — AL loop for
DeepLabAccuracyPredictor with joint loss w_dl*L_seg + w_un*L_acc, the
staged weight schedule for enet / --no-end-to-end (reference lines
374-385), and the accuracy | gradient | uncertain | uncertain_gradient
selection modes (lines 480-509).
"""

import argparse
import math
import random

from deep_active_semantic_segmentation_tpu.config import (
    add_common_flags, config_from_args)
from deep_active_semantic_segmentation_tpu.data import make_dataloader
from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh
from deep_active_semantic_segmentation_tpu.selection import (
    get_active_selection_class)
from deep_active_semantic_segmentation_tpu.utils.early_stop import (
    EarlyStopChecker)
from deep_active_semantic_segmentation_tpu.utils.saver import Saver
from deep_active_semantic_segmentation_tpu.utils.summaries import (
    TensorboardSummary)


def build_weight_schedules(epochs, weight_unet, staged):
    """Reference accuracy_predictor_train.py:372-385."""
    w_dl = [1 - weight_unet] * epochs
    w_un = [weight_unet] * epochs
    if staged:
        for i in range(0, epochs * 2 // 3):
            w_dl[i], w_un[i] = 1.0, 0.0
        for i in range(2 * epochs // 3, epochs):
            w_dl[i], w_un[i] = 0.0, 1.0
    return w_dl, w_un


def main(argv=None, dataset_root=None, runs_root=None):
    parser = argparse.ArgumentParser(
        description="TPU accuracy-predictor training")
    add_common_flags(parser, selection_choices=[
        "accuracy", "gradient", "uncertain", "uncertain_gradient"])
    parser.add_argument("--weight-unet", type=float, default=0.30)
    parser.add_argument("--weight-wrong-label-unet", type=float, default=0.75)
    parser.add_argument("--accuracy-selection", type=str, default="softmax",
                        choices=["softmax", "argmax"])
    parser.add_argument("--no-end-to-end", action="store_true", default=False)
    parser.add_argument("--symmetry", action="store_true", default=False)
    ns = parser.parse_args(argv)
    args = config_from_args(ns)

    mesh = make_mesh(args.num_devices)
    cfg = args.finalize(n_devices=mesh.devices.size)
    print(cfg)
    random.seed(cfg.seed)

    w_dl, w_un = build_weight_schedules(
        cfg.epochs, ns.weight_unet,
        staged=cfg.architecture == "enet" or ns.no_end_to_end)

    training_set, train_loader, val_loader, _, nclass = make_dataloader(
        cfg.dataset, cfg.base_size, cfg.crop_size, cfg.batch_size,
        cfg.workers, cfg.overfit, init_set=cfg.seed_set,
        memory_hog=cfg.memory_hog, dataset_root=dataset_root, seed=cfg.seed,
        device_normalize=cfg.uint8_wire)

    saver = Saver(cfg, remove_existing=False, runs_root=runs_root)
    saver.save_experiment_config()
    summary = TensorboardSummary(saver.experiment_dir)
    writer = summary.create_summary()

    active_selector = get_active_selection_class(
        "accuracy_labels", nclass, training_set.store, cfg.crop_size,
        cfg.batch_size, scoring_precision=cfg.scoring_precision)

    total_iterations = min(
        len(training_set.image_paths) // cfg.active_batch_size - 1,
        cfg.max_iterations)

    trainer = Trainer(cfg, train_loader, val_loader, nclass, mesh=mesh,
                      dual_head=True, runs_root=runs_root)
    trainer.initialize()

    history = {}
    for selection_iter in range(cfg.resume, total_iterations):
        print(f"ActiveIteration-{selection_iter:03d}/{total_iterations:03d}")
        fraction = round(training_set.get_fraction_of_labeled_data() * 100)

        if cfg.dataset.endswith("_image"):
            trainer.setup_saver_and_summary(
                fraction, training_set.current_image_paths)
        else:
            trainer.setup_saver_and_summary(
                fraction, training_set.current_image_paths,
                regions=[training_set.current_paths_to_regions_map[x]
                         for x in training_set.current_image_paths])

        training_set.make_dataset_multiple_of_batchsize(cfg.batch_size)
        trainer.initialize()

        early_stop = None
        if not cfg.no_early_stop:
            early_stop = EarlyStopChecker(patience=5,
                                          min_improvement=cfg.min_improvement)
        best = dict(mIoU=0.0, Acc=0.0, Acc_class=0.0, FWIoU=0.0)
        train_loss = test_loss = 0.0
        visualizations = None
        for outer_epoch in range(cfg.epochs // cfg.eval_interval):
            train_loss = 0.0
            for inner_epoch in range(cfg.eval_interval):
                epoch = outer_epoch * cfg.eval_interval + inner_epoch
                train_loss += trainer.training(epoch, w_dl[epoch], w_un[epoch])
            (test_loss, mIoU, Acc, Acc_class, FWIoU,
             visualizations) = trainer.validation(
                epoch, w_dl[epoch], w_un[epoch])
            for k, v in zip(("mIoU", "Acc", "Acc_class", "FWIoU"),
                            (mIoU, Acc, Acc_class, FWIoU)):
                best[k] = max(best[k], v)
            if early_stop is not None and early_stop(mIoU):
                print(f"Early stopping triggered after {epoch} epochs")
                break

        training_set.reset_dataset()
        history[fraction] = dict(best)
        writer.add_scalar("active_loop/train_loss",
                          train_loss / len(training_set), fraction)
        writer.add_scalar("active_loop/val_loss", test_loss, fraction)
        for k in best:
            tag = {"FWIoU": "fwIoU"}.get(k, k)
            writer.add_scalar(f"active_loop/{tag}", best[k], fraction)
        if visualizations is not None:
            # round-end accuracy panel (reference :474)
            summary.create_single_visualization(
                writer, "active_loop", cfg.dataset, visualizations[0],
                visualizations[1], visualizations[2], visualizations[3],
                visualizations[4],
                len(training_set.current_image_paths))

        if selection_iter == total_iterations - 1:
            break

        trainer.load_best_checkpoint()
        bundle = trainer.bundle
        mode = cfg.active_selection_mode

        if mode == "accuracy":
            if cfg.dataset.endswith("_image"):
                selected = active_selector.get_least_accurate_samples(
                    bundle, training_set.remaining_image_paths,
                    cfg.active_batch_size, ns.accuracy_selection)
                training_set.expand_training_set(selected)
            else:
                regions, counts = active_selector.get_least_accurate_region_maps(
                    bundle, training_set.image_paths,
                    training_set.get_existing_region_maps(),
                    cfg.active_region_size, cfg.active_batch_size)
                print(f"Got {counts}/"
                      f"{math.ceil(cfg.active_batch_size * cfg.crop_size ** 2 / cfg.active_region_size ** 2)}"
                      " regions")
                training_set.expand_training_set(
                    regions, counts * cfg.active_region_size ** 2)
        elif mode == "gradient":
            training_set.expand_training_set(
                active_selector.get_adversarially_vulnarable_samples(
                    bundle, training_set.remaining_image_paths,
                    cfg.active_batch_size))
        elif mode == "uncertain":
            training_set.expand_training_set(
                active_selector.get_unsure_samples(
                    bundle, training_set.remaining_image_paths,
                    cfg.active_batch_size))
        elif mode == "uncertain_gradient":
            selected = active_selector.get_unsure_samples(
                bundle, training_set.remaining_image_paths,
                cfg.active_batch_size * 2)
            selected = active_selector.get_adversarially_vulnarable_samples(
                bundle, selected, cfg.active_batch_size)
            training_set.expand_training_set(selected)
        else:
            raise NotImplementedError(mode)
    writer.close()
    return history


if __name__ == "__main__":
    main()
