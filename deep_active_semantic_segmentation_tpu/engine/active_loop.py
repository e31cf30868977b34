"""The outer active-learning loop.

Parity: reference active_train.py:336-529 — per-iteration fresh model
init, train-with-early-stop, best-checkpoint reload, dispatch of all 13
selection modes, pool expansion, resume-from-selections, and the
active_loop/* scalar schema keyed by percent-of-data-labeled.
"""

from __future__ import annotations

import math
import os
import random
from typing import Optional

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.config import ExperimentConfig
from deep_active_semantic_segmentation_tpu.data import make_dataloader
from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
from deep_active_semantic_segmentation_tpu.selection import (
    get_active_selection_class, get_max_subset_active_selector)
from deep_active_semantic_segmentation_tpu.utils.early_stop import (
    EarlyStopChecker)
from deep_active_semantic_segmentation_tpu.utils.saver import Saver
from deep_active_semantic_segmentation_tpu.utils.summaries import (
    TensorboardSummary)


def run_active_loop(args: ExperimentConfig, mesh=None,
                    dataset_root: Optional[str] = None,
                    runs_root: Optional[str] = None) -> dict:
    """Returns a summary dict {round: {mIoU, ...}} for tests/benches."""
    random.seed(args.seed)

    # fail fast on invalid mode/dataset combos (the reference only asserts
    # at selection time, after a full training round — active_train.py:466)
    if args.active_selection_mode == "coreset" and not args.dataset.endswith("_image"):
        raise AssertionError("only images supported for coreset approach")
    region_capable = ("random", "variance", "variance_representative",
                      "noise_variance", "accuracy_eval", "accuracy_labels")
    if args.dataset.endswith("_region") and \
            args.active_selection_mode not in region_capable:
        raise NotImplementedError(
            f"selection mode '{args.active_selection_mode}' does not support "
            f"region datasets")

    training_set, train_loader, val_loader, _, nclass = make_dataloader(
        args.dataset, args.base_size, args.crop_size, args.batch_size,
        args.workers, args.overfit, init_set=args.seed_set,
        memory_hog=args.memory_hog, dataset_root=dataset_root,
        seed=args.seed,
        device_normalize=getattr(args, "uint8_wire", True))
    args.nclass = nclass

    saver = Saver(args, remove_existing=False, runs_root=runs_root)
    saver.save_experiment_config()
    summary = TensorboardSummary(saver.experiment_dir)
    writer = summary.create_summary()

    active_selector = get_active_selection_class(
        args.active_selection_mode, nclass, training_set.store,
        args.crop_size, args.batch_size, mesh=mesh,
        scoring_precision=args.scoring_precision)
    max_subset_selector = get_max_subset_active_selector(
        training_set.store, args.crop_size, args.batch_size, mesh=mesh,
        scoring_precision=args.scoring_precision)

    total_iterations = min(
        len(training_set.image_paths) // args.active_batch_size - 1,
        args.max_iterations)

    # resume: replay selections.txt into the pool (active_train.py:364-369)
    if args.resume != 0 and args.resume_selections is not None:
        seed_size = len(training_set)
        with open(os.path.join(saver.experiment_dir,
                               args.resume_selections)) as f:
            paths = [x.strip().encode("ascii") for x in f.readlines()
                     if x.strip()]
        training_set.expand_training_set(paths[seed_size:])
        assert len(training_set) == (
            args.resume * args.active_batch_size + seed_size)

    assert args.eval_interval <= args.epochs
    assert args.epochs % args.eval_interval == 0

    trainer = Trainer(args, train_loader, val_loader, nclass, mesh=mesh,
                      runs_root=runs_root)
    trainer.initialize()
    history = {}

    for selection_iter in range(args.resume, total_iterations):
        print(f"ActiveIteration-{selection_iter:03d}/{total_iterations:03d}")
        fraction = round(training_set.get_fraction_of_labeled_data() * 100)

        if args.dataset.endswith("_image"):
            trainer.setup_saver_and_summary(
                fraction, training_set.current_image_paths)
        elif args.dataset.endswith("_region"):
            trainer.setup_saver_and_summary(
                fraction, training_set.current_image_paths,
                regions=[training_set.current_paths_to_regions_map[x]
                         for x in training_set.current_image_paths])
        else:
            raise NotImplementedError(args.dataset)

        training_set.make_dataset_multiple_of_batchsize(args.batch_size)
        trainer.initialize()  # fresh model every round (active_train.py:394)

        early_stop = None
        if not args.no_early_stop:
            early_stop = EarlyStopChecker(patience=5,
                                          min_improvement=args.min_improvement)

        best = dict(mIoU=0.0, Acc=0.0, Acc_class=0.0, FWIoU=0.0)
        train_loss = test_loss = 0.0
        visualizations = None
        for outer_epoch in range(args.epochs // args.eval_interval):
            train_loss = 0.0
            for inner_epoch in range(args.eval_interval):
                epoch = outer_epoch * args.eval_interval + inner_epoch
                train_loss += trainer.training(epoch)
            (test_loss, mIoU, Acc, Acc_class, FWIoU,
             visualizations) = trainer.validation(epoch)
            best["mIoU"] = max(best["mIoU"], mIoU)
            best["Acc"] = max(best["Acc"], Acc)
            best["Acc_class"] = max(best["Acc_class"], Acc_class)
            best["FWIoU"] = max(best["FWIoU"], FWIoU)
            if early_stop is not None and early_stop(mIoU):
                print(f"Early stopping triggered after {epoch} epochs")
                break

        training_set.reset_dataset()
        history[fraction] = dict(best)

        writer.add_scalar("active_loop/train_loss",
                          train_loss / len(training_set), fraction)
        writer.add_scalar("active_loop/val_loss", test_loss, fraction)
        writer.add_scalar("active_loop/mIoU", best["mIoU"], fraction)
        writer.add_scalar("active_loop/Acc", best["Acc"], fraction)
        writer.add_scalar("active_loop/Acc_class", best["Acc_class"], fraction)
        writer.add_scalar("active_loop/fwIoU", best["FWIoU"], fraction)
        if visualizations is not None and not trainer.dual_head:
            summary.visualize_image(writer, args.dataset, visualizations[0],
                                    visualizations[1], visualizations[2],
                                    len(training_set.current_image_paths))

        if selection_iter == total_iterations - 1:
            break

        trainer.load_best_checkpoint()
        bundle = trainer.bundle
        mode = args.active_selection_mode

        # -- selection dispatch (active_train.py:445-527) --
        if mode == "random":
            training_set.expand_training_set(
                active_selector.get_random_uncertainity(
                    training_set.remaining_image_paths,
                    args.active_batch_size))
        elif mode in ("variance", "variance_representative"):
            if args.dataset.endswith("_image"):
                print("Calculating entropies..")
                selected = active_selector.get_vote_entropy_for_images(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size, seed=args.seed + selection_iter)
                if mode == "variance_representative":
                    selected = max_subset_selector.get_representative_images(
                        bundle, training_set.image_paths, selected)
                training_set.expand_training_set(selected)
            elif args.dataset.endswith("_region"):
                print("Creating region maps..")
                regions, counts = active_selector.create_region_maps(
                    bundle, training_set.image_paths,
                    training_set.get_existing_region_maps(),
                    args.active_region_size, args.active_batch_size,
                    seed=args.seed + selection_iter)
                if mode == "variance_representative":
                    regions, counts = max_subset_selector.get_representative_regions(
                        bundle, training_set.image_paths, regions,
                        args.active_region_size)
                print(f"Got {counts}/"
                      f"{math.ceil(args.active_batch_size * args.crop_size ** 2 / args.active_region_size ** 2)}"
                      " regions")
                training_set.expand_training_set(
                    regions, counts * args.active_region_size ** 2)
            else:
                raise NotImplementedError(args.dataset)
        elif mode == "coreset":
            assert args.dataset.endswith("_image"), \
                "only images supported for coreset approach"
            training_set.expand_training_set(
                active_selector.get_k_center_greedy_selections(
                    args.active_batch_size, bundle,
                    training_set.remaining_image_paths,
                    training_set.current_image_paths))
        elif mode == "ceal_confidence":
            training_set.expand_training_set(
                active_selector.get_least_confident_samples(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size))
        elif mode == "ceal_margin":
            training_set.expand_training_set(
                active_selector.get_least_margin_samples(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size))
        elif mode == "ceal_entropy":
            training_set.expand_training_set(
                active_selector.get_maximum_entropy_samples(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size)[0])
        elif mode == "ceal_fusion":
            training_set.expand_training_set(
                active_selector.get_fusion_of_confidence_margin_entropy_samples(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size))
        elif mode == "ceal_entropy_weakly_labeled":
            selected_samples, entropies = \
                active_selector.get_maximum_entropy_samples(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size)
            training_set.clear_weak_labels()
            threshold = (args.weak_label_entropy_threshold
                         - selection_iter * args.weak_label_threshold_decay)
            weak_labels = active_selector.get_weakly_labeled_data(
                bundle, training_set.remaining_image_paths, threshold,
                entropies)
            for sample in selected_samples:
                if sample in weak_labels:
                    del weak_labels[sample]
            training_set.expand_training_set(selected_samples)
            training_set.add_weak_labels(weak_labels)
        elif mode == "noise_image":
            training_set.expand_training_set(
                active_selector.get_vote_entropy_for_images_with_input_noise(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size, seed=args.seed + selection_iter))
        elif mode == "noise_feature":
            training_set.expand_training_set(
                active_selector.get_vote_entropy_for_images_with_feature_noise(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size, seed=args.seed + selection_iter))
        elif mode == "noise_variance":
            if args.dataset.endswith("_image"):
                training_set.expand_training_set(
                    active_selector.get_vote_entropy_for_batch_with_noise_and_vote_entropy(
                        bundle, training_set.remaining_image_paths,
                        args.active_batch_size,
                        seed=args.seed + selection_iter))
            elif args.dataset.endswith("_region"):
                regions, counts = active_selector.create_region_maps(
                    bundle, training_set.image_paths,
                    training_set.get_existing_region_maps(),
                    args.active_region_size, args.active_batch_size,
                    seed=args.seed + selection_iter)
                training_set.expand_training_set(
                    regions, counts * args.active_region_size ** 2)
        elif mode == "accuracy_labels":
            training_set.expand_training_set(
                active_selector.get_least_accurate_sample_using_labels(
                    bundle, training_set.remaining_image_paths,
                    args.active_batch_size))
        elif mode == "accuracy_eval":
            monitor_dir = os.path.join(runs_root or constants.RUNS,
                                       args.dataset, args.monitor_directory)
            pct = round(training_set.get_next_est_fraction_of_labeled_data(
                args.active_batch_size) * 100)
            selections_file = os.path.join(monitor_dir, f"run_{pct:04d}",
                                           "selections.txt")
            print("Waiting for the next folder to be available..",
                  selections_file)
            training_set.expand_training_set(
                active_selector.wait_for_selected_samples(
                    selections_file, training_set.remaining_image_paths))
        else:
            raise NotImplementedError(mode)

    writer.close()
    return history
