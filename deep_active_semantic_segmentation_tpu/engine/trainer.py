"""The Trainer shared by all drivers.

Parity: reference Trainer classes (active_train.py:27-194,
train.py:25-211, accuracy_predictor_train.py:25-241) folded into one —
fresh initialize() per AL round, per-epoch training/validation with the
reference's scalar tag schema and best-checkpoint logic, plus a
``dual_head`` mode for the two-headed accuracy predictor.

TPU notes: train batches go straight into the jitted sharded step; per-iter
losses are kept as device arrays during the epoch and fetched once at the
end (the reference's per-batch `.item()` pattern would force a host sync
every step). Validation accumulates the confusion matrix on device.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import jax
import numpy as np

from deep_active_semantic_segmentation_tpu.config import ExperimentConfig
from deep_active_semantic_segmentation_tpu.models import (
    build_model, lr_multiplier_tree)
from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
    constant_schedule, make_schedule)
from deep_active_semantic_segmentation_tpu.ops.metrics import Evaluator
from deep_active_semantic_segmentation_tpu.parallel import optim
from deep_active_semantic_segmentation_tpu.parallel.steps import (
    init_train_state, make_dual_eval_step, make_dual_train_step,
    make_eval_step, make_train_step)
from deep_active_semantic_segmentation_tpu.selection.base import ModelBundle
from deep_active_semantic_segmentation_tpu.utils.checkpoint import load_checkpoint
from deep_active_semantic_segmentation_tpu.utils.class_weights import (
    calculate_weights_labels)
from deep_active_semantic_segmentation_tpu.utils.saver import (
    BEST_NAME, ActiveSaver)
from deep_active_semantic_segmentation_tpu.utils.summaries import (
    TensorboardSummary)


class Trainer:
    def __init__(self, args: ExperimentConfig, train_loader, val_loader,
                 nclass: int, mesh=None, dual_head: bool = False,
                 runs_root: Optional[str] = None,
                 train_grids: bool = False):
        self.args = args
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.nclass = nclass
        self.mesh = mesh
        self.dual_head = dual_head
        self.runs_root = runs_root
        # Train-epoch grid parity: the passive trainer logs one train-batch
        # grid per epoch (reference train.py:128-134, prefix='train') and
        # the dual-head trainer one accuracy panel per epoch
        # (accuracy_predictor_train.py:133); the plain ACTIVE trainer logs
        # none (active_train.py only emits val grids). train.py passes
        # train_grids=True; dual_head implies it.
        self.train_grids = train_grids or dual_head
        self.writer = None
        self.saver = None
        self._class_weights = None
        self._pretrained_trees = None  # converted once, grafted every init
        # jitted step fns built ONCE per Trainer and reused by every
        # per-round initialize(): rebuilding them would discard the jit
        # compile cache, so each AL round would recompile the full train
        # step even though nothing but the lr-schedule constants moved
        # (SURVEY hard part #6). Per-round schedule geometry travels as a
        # traced operand instead (self._sched_dyn).
        self._steps_cache = None
        self._sched_dyn = None
        self.train_step_scan = None  # built when args.scan_steps > 1
        self._rng = jax.random.PRNGKey(args.seed if args.seed >= 0 else 0)

    # -- saver / summary (active_train.py:34-40) --
    def setup_saver_and_summary(self, num_current_labeled_samples, samples,
                                experiment_group=None, regions=None):
        self.num_current_labeled_samples = num_current_labeled_samples
        self.saver = ActiveSaver(self.args, num_current_labeled_samples,
                                 experiment_group=experiment_group,
                                 runs_root=self.runs_root)
        self.saver.save_experiment_config()
        self.saver.save_active_selections(samples, regions)
        self.summary = TensorboardSummary(self.saver.experiment_dir)
        self.writer = self.summary.create_summary()

    # -- model/optimizer construction (active_train.py:42-87) --
    def initialize(self):
        args = self.args
        arch = "accuracy_predictor" if self.dual_head else args.architecture
        self.model = build_model(
            arch, self.nclass, backbone=args.backbone,
            output_stride=args.out_stride, mc_dropout=args.mc_dropout,
            enet_head=self.dual_head and args.architecture == "enet",
            symmetry=getattr(args, "symmetry", False))
        self._rng, init_rng = jax.random.split(self._rng)
        # crop_size defines the train geometry; -1 means letterbox base_size
        side = args.crop_size if args.crop_size != -1 else args.base_size
        input_shape = (1, side, side, 3)
        self.state = init_train_state(self.model, init_rng, input_shape,
                                      optimizer=args.optimizer,
                                      mesh=self.mesh)
        self._transplant_pretrained_backbone()
        lr_mults = lr_multiplier_tree(
            self.state.params,
            "accuracy_predictor" if self.dual_head else args.architecture,
            symmetry=getattr(args, "symmetry", False),
            enet_head=args.architecture == "enet")

        if args.use_balanced_weights and self._class_weights is None:
            print("Calculating class weights..")
            self._class_weights = calculate_weights_labels(
                self.train_loader, self.nclass)

        # per-round schedule geometry: the AL loop retrains from scratch on
        # a GROWING labeled set (active_train.py:394), so total iters and
        # iters-per-epoch change every round. They ride into the (cached,
        # compiled-once) step as a traced operand, never as a new constant.
        ipe = max(len(self.train_loader), 1)
        self._sched_dyn = np.array([args.epochs * ipe, ipe], np.float32)

        if self._steps_cache is not None:
            (self.train_step, self.eval_step,
             self.train_step_scan) = self._steps_cache
        else:
            if args.use_lr_scheduler:
                schedule = make_schedule(args.lr_scheduler, args.lr,
                                         args.epochs, ipe,
                                         lr_step=args.lr_step)
            else:
                schedule = constant_schedule(args.lr)

            opt_cfg = None
            if args.optimizer == "SGD":
                opt_cfg = optim.SGDConfig(args.momentum, args.weight_decay,
                                          args.nesterov)
            elif args.optimizer == "Adam":
                opt_cfg = optim.AdamConfig(weight_decay=args.weight_decay)
            elif args.optimizer == "RMSprop":
                opt_cfg = optim.RMSpropConfig()

            import jax.numpy as jnp

            compute_dtype = (jnp.bfloat16 if args.dtype == "bfloat16"
                             else jnp.float32)
            if self.dual_head:
                w_wrong = getattr(args, "weight_wrong_label_unet", 0.75)
                unet_weights = np.array([w_wrong, 1 - w_wrong], np.float32)
                self.train_step = make_dual_train_step(
                    self.model, loss_mode=args.loss_type,
                    class_weights=self._class_weights,
                    unet_class_weights=unet_weights, schedule=schedule,
                    lr_mults=lr_mults, optimizer=args.optimizer,
                    opt_cfg=opt_cfg, mesh=self.mesh,
                    compute_dtype=compute_dtype,
                    remat=getattr(args, "remat", False),
                    dynamic_schedule=True)
                self.eval_step = make_dual_eval_step(
                    self.model, self.nclass, loss_mode=args.loss_type,
                    class_weights=self._class_weights,
                    unet_class_weights=unet_weights, mesh=self.mesh)
            else:
                self.train_step = make_train_step(
                    self.model, loss_mode=args.loss_type,
                    class_weights=self._class_weights, schedule=schedule,
                    lr_mults=lr_mults, optimizer=args.optimizer,
                    opt_cfg=opt_cfg, mesh=self.mesh,
                    compute_dtype=compute_dtype,
                    remat=getattr(args, "remat", False),
                    dynamic_schedule=True)
                self.eval_step = make_eval_step(
                    self.model, self.nclass, loss_mode=args.loss_type,
                    class_weights=self._class_weights, mesh=self.mesh)
                # scan_steps>1: an ADDITIONAL k-step fused program
                # (one dispatch per k optimizer steps — dispatch
                # amortization on relay-attached chips). training()
                # groups full k-batch windows through it and routes the
                # epoch remainder through the single-step program; both
                # live in the per-Trainer cache so neither recompiles
                # across AL rounds (SURVEY hard part #6).
                k = int(getattr(args, "scan_steps", 1) or 1)
                if k > 1:
                    self.train_step_scan = make_train_step(
                        self.model, loss_mode=args.loss_type,
                        class_weights=self._class_weights, schedule=schedule,
                        lr_mults=lr_mults, optimizer=args.optimizer,
                        opt_cfg=opt_cfg, mesh=self.mesh,
                        compute_dtype=compute_dtype,
                        remat=getattr(args, "remat", False),
                        dynamic_schedule=True, scan_steps=k)
            self._steps_cache = (self.train_step, self.eval_step,
                                 self.train_step_scan)
        if self.dual_head:
            self.unet_evaluator = Evaluator(2)
        self.evaluator = Evaluator(self.nclass)
        self.best_pred = 0.0

    def _transplant_pretrained_backbone(self):
        """ImageNet-pretrained backbone init, reference default behavior
        (models/backbone/mobilenet.py:130-157, resnet.py:147-157,
        deeplab.py:13,22). Runs inside EVERY initialize() so each AL
        round's fresh model starts from the pretrained backbone exactly as
        the reference's per-round re-init does (active_train.py:394).

        The checkpoint is read + converted once and cached; per-round cost
        is one host->device transfer of the backbone leaves. Only DeepLab
        heads carry pretrained backbones (the reference builds ENet /
        FastSCNN / the symmetric error head with pretrained=False,
        accuracy_predictor.py:21)."""
        args = self.args
        path = getattr(args, "pretrained_weights", None)
        if not path or not args.pretrained:
            return
        if args.architecture != "deeplab":
            return
        from deep_active_semantic_segmentation_tpu.models import pretrained as pt
        from deep_active_semantic_segmentation_tpu.parallel.steps import (
            TrainState, place_replicated)

        if self._pretrained_trees is None:
            sd = pt.load_backbone_state_dict(path)
            self._pretrained_trees = pt.backbone_weights_from_state_dict(
                sd, args.backbone)
        bp, bs = self._pretrained_trees
        params = jax.tree_util.tree_map(np.asarray, self.state.params)
        stats = jax.tree_util.tree_map(np.asarray, self.state.batch_stats)
        root = ("deeplab",) if self.dual_head else ()
        node_p, node_s = params, stats
        for key in root + ("backbone",):
            node_p, node_s = node_p[key], node_s[key]
        pt._merge(node_p, bp)
        pt._merge(node_s, bs)
        self.state = TrainState(params=params, batch_stats=stats,
                                opt_state=self.state.opt_state,
                                step=self.state.step)
        if self.mesh is not None:
            self.state = place_replicated(self.state, self.mesh)

    def _prefetched(self, loader):
        """Double-buffered sharded host->device prefetch: batch N+1's
        transform + transfer overlaps batch N's device step."""
        from deep_active_semantic_segmentation_tpu.data.loader import (
            prefetch_to_device)
        from deep_active_semantic_segmentation_tpu.parallel.mesh import (
            shard_batch)

        if self.mesh is None:
            return iter(loader)

        def put(batch):
            out = shard_batch(self.mesh, {"image": batch["image"],
                                          "label": batch["label"]})
            out["nvalid"] = batch["nvalid"]
            return out

        return prefetch_to_device(iter(loader), put, depth=2)

    @property
    def bundle(self) -> ModelBundle:
        return ModelBundle(self.model, self.state.params,
                           self.state.batch_stats)

    def load_best_checkpoint(self):
        """Reload best.ckpt before selection (active_train.py:440-441)."""
        from deep_active_semantic_segmentation_tpu.parallel.steps import (
            place_replicated)

        path = os.path.join(self.saver.experiment_dir, BEST_NAME)
        self.state, _ = load_checkpoint(path, self.state)
        if self.mesh is not None:
            self.state = place_replicated(self.state, self.mesh)

    # -- one training epoch (active_train.py:89-127) --
    def training(self, epoch: int, w_dl: Optional[float] = None,
                 w_un: Optional[float] = None) -> float:
        import time

        num_img_tr = len(self.train_loader)
        self._rng, epoch_rng = jax.random.split(self._rng)
        device_losses = []
        epoch_start = time.perf_counter()
        n_images = 0
        # visualization pick mirrors the reference: the dual-head trainer
        # indexes over the train loader (accuracy_predictor_train.py:91),
        # the passive trainer — quirkily — over the VAL loader's length
        # (train.py:106); either way an out-of-range pick simply skips the
        # epoch's grid (the reference would crash on an unbound local).
        vis_batch = None
        vis_index = -1
        if self.train_grids and self.writer is not None:
            vis_index = int(random.random() * (
                num_img_tr if self.dual_head else len(self.val_loader)))
        # scan_steps>1 (non-dual): full k-batch windows dispatch ONE fused
        # k-step program (dispatch amortization, config.scan_steps); the
        # epoch remainder rides the single-step program. Per-iter metrics
        # come back stacked with a leading k and are flattened at the
        # epoch-end fetch, so the TB scalar stream is unchanged.
        scan_k = (int(getattr(self.args, "scan_steps", 1) or 1)
                  if self.train_step_scan is not None
                  and not self.dual_head else 1)
        window = []
        for i, batch in enumerate(self._prefetched(self.train_loader)):
            n_images += batch["nvalid"]
            step_batch = {"image": batch["image"], "label": batch["label"]}
            if i == vis_index:
                vis_batch = step_batch  # device-resident, not donated
            if self.dual_head:
                self.state, metrics = self.train_step(
                    self.state, step_batch, epoch_rng,
                    np.float32(w_dl), np.float32(w_un), self._sched_dyn)
            elif scan_k > 1:
                window.append(step_batch)
                if len(window) < scan_k:
                    continue
                self.state, metrics = self.train_step_scan(
                    self.state, tuple(window), epoch_rng, self._sched_dyn)
                window = []
            else:
                self.state, metrics = self.train_step(
                    self.state, step_batch, epoch_rng, self._sched_dyn)
            device_losses.append(metrics)
        for step_batch in window:  # remainder shorter than the scan window
            self.state, metrics = self.train_step(
                self.state, step_batch, epoch_rng, self._sched_dyn)
            device_losses.append(metrics)
        # fetch once per epoch; write the reference's per-iter scalars
        # (stacked k-step metrics flatten back to per-step scalars here)
        flat = []
        for metrics in device_losses:
            arrs = {k: np.asarray(v) for k, v in metrics.items()}
            if arrs["loss"].ndim == 0:
                flat.append({k: float(v) for k, v in arrs.items()})
            else:
                flat.extend({k: float(v[j]) for k, v in arrs.items()}
                            for j in range(arrs["loss"].shape[0]))
        train_loss = 0.0
        for i, metrics in enumerate(flat):
            loss = metrics["loss"]
            train_loss += loss
            if self.writer is not None:
                self.writer.add_scalar("train/total_loss_iter", loss,
                                       i + num_img_tr * epoch)
                if self.dual_head:
                    self.writer.add_scalar("train/total_loss_iter_dl",
                                           metrics["loss_dl"],
                                           i + num_img_tr * epoch)
                    self.writer.add_scalar("train/total_loss_iter_un",
                                           metrics["loss_un"],
                                           i + num_img_tr * epoch)
                if self.args.use_lr_scheduler:
                    self.writer.add_scalar("train/learning_rate",
                                           metrics["lr"],
                                           i + num_img_tr * epoch)
        # float(loss) above forced completion, so the wall clock is honest
        imgs_per_sec = n_images / max(time.perf_counter() - epoch_start, 1e-9)
        if self.writer is not None:
            self.writer.add_scalar("train/total_loss_epoch", train_loss, epoch)
            self.writer.add_scalar("train/imgs_per_sec", imgs_per_sec, epoch)
        if vis_batch is not None and self.writer is not None:
            # epoch-end grid of the captured train batch, predicted with the
            # (cached, compiled-once) eval step — reference train.py:134 /
            # accuracy_predictor_train.py:133 log the mid-epoch training
            # output; predicting at epoch end keeps the hot loop free of
            # per-iter host fetches (same panel, fresher weights).
            if self.dual_head:
                out = self.eval_step(
                    self.state, vis_batch, np.float32(self.args.batch_size),
                    np.float32(w_dl), np.float32(w_un))
                self.summary.create_single_visualization(
                    self.writer,
                    f"train/run_{self.num_current_labeled_samples:04d}"
                    if hasattr(self, "num_current_labeled_samples")
                    else "train", self.args.dataset,
                    vis_batch["image"], vis_batch["label"], out["pred"],
                    out["unet_target"], out["err_pred"], epoch)
            else:
                out = self.eval_step(self.state, vis_batch,
                                     np.float32(self.args.batch_size))
                self.summary.visualize_image(
                    self.writer, self.args.dataset, vis_batch["image"],
                    vis_batch["label"], out["pred"], epoch, prefix="train")
        print(f"[Epoch: {epoch}] Loss: {train_loss:.3f} "
              f"BestPred: {self.best_pred:.3f} "
              f"({imgs_per_sec:.1f} imgs/s)")
        if self.args.no_val and self.saver is not None:
            self.saver.save_checkpoint(self.state, epoch + 1, self.best_pred,
                                       is_best=False)
        return train_loss

    # -- validation (active_train.py:129-194) --
    def validation(self, epoch: int, w_dl: Optional[float] = None,
                   w_un: Optional[float] = None):
        self.evaluator.reset()
        if self.dual_head:
            self.unet_evaluator.reset()
        test_loss = 0.0
        visualization_index = int(random.random() * len(self.val_loader))
        vis = None
        for i, batch in enumerate(self._prefetched(self.val_loader)):
            step_batch = {"image": batch["image"], "label": batch["label"]}
            if self.dual_head:
                out = self.eval_step(self.state, step_batch,
                                     np.float32(batch["nvalid"]),
                                     np.float32(w_dl), np.float32(w_un))
                self.unet_evaluator.add_matrix(out["unet_confusion"])
            else:
                out = self.eval_step(self.state, step_batch,
                                     np.float32(batch["nvalid"]))
            test_loss += float(out["loss"])
            self.evaluator.add_matrix(out["confusion"])
            if i == visualization_index:
                if self.dual_head:
                    # the 5-tuple the dual driver's round-end panel expects
                    # (accuracy_predictor_train.py:450,474): image, seg gt,
                    # seg pred, acc gt, acc pred
                    vis = [batch["image"], batch["label"], out["pred"],
                           np.asarray(out["unet_target"]), out["err_pred"]]
                else:
                    vis = [batch["image"], batch["label"], out["pred"]]

        Acc = self.evaluator.Pixel_Accuracy()
        Acc_class = self.evaluator.Pixel_Accuracy_Class()
        mIoU = self.evaluator.Mean_Intersection_over_Union()
        FWIoU = self.evaluator.Frequency_Weighted_Intersection_over_Union()
        if self.writer is not None:
            self.writer.add_scalar("val/total_loss_epoch", test_loss, epoch)
            self.writer.add_scalar("val/mIoU", mIoU, epoch)
            self.writer.add_scalar("val/Acc", Acc, epoch)
            self.writer.add_scalar("val/Acc_class", Acc_class, epoch)
            self.writer.add_scalar("val/fwIoU", FWIoU, epoch)
            if self.dual_head:
                self.writer.add_scalar("val/UNetAcc",
                                       self.unet_evaluator.Pixel_Accuracy(),
                                       epoch)
        print(f"Validation: [Epoch: {epoch}] Acc:{Acc}, Acc_class:{Acc_class},"
              f" mIoU:{mIoU}, fwIoU: {FWIoU} Loss: {test_loss:.3f}")

        new_pred = mIoU
        is_best = new_pred > self.best_pred
        if is_best:
            self.best_pred = new_pred
        if self.saver is not None:
            self.saver.save_checkpoint(self.state, epoch + 1, self.best_pred,
                                       is_best=is_best)
        return test_loss, mIoU, Acc, Acc_class, FWIoU, vis
