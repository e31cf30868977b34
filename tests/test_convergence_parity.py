"""Training-trajectory parity vs the ACTUAL reference implementation
(north star #1 support, VERDICT round-1 item 7).

Real Cityscapes doesn't exist in this container, so parity is measured on
a synthetic learnable task at the reference's exact hyperparameter shape:
identical initial weights (torch init transplanted into flax), identical
batches in identical order, the reference's own SegmentationLosses +
LR_Scheduler + torch.optim.SGD with 1x/10x groups on one side, our
losses/schedule/optim on the other.

Two granularities:
* step-level — dropout disabled and BN held in eval mode (running stats)
  on both sides makes the trajectory fully deterministic; per-step losses
  must then track each other tightly over 12 optimizer steps (catches any
  loss/LR/optimizer drift immediately). Train-mode BN cannot be compared
  at this tolerance: normalizing by the batch std amplifies cross-backend
  conv rounding by 1/std per layer (measured: 0.04 after the stem,
  compounding to ~2 logits after 17 blocks) — that is float noise, not
  semantics, and the convergence test covers real train-mode BN.
* convergence-level — mIoU after real train-mode training must match.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_bridge as rb

NCLS = 6
SIDE = 65   # 4k+1: the reference's geometry family (513, crop sizes);
            # even sizes diverge under align_corners upsampling
BLOCK = 13
BATCH = 4
LR = 0.01
EPOCHS = 6  # schedule horizon (poly decay denominator)


def _learnable_batches(n_batches, seed=0):
    """Batches of a block-color rule task, already normalized (NHWC f32)."""
    rng = np.random.RandomState(seed)
    mean = np.asarray((0.485, 0.456, 0.406), np.float32)
    std = np.asarray((0.229, 0.224, 0.225), np.float32)
    batches = []
    for _ in range(n_batches):
        blocks = rng.randint(0, NCLS, size=(BATCH, SIDE // BLOCK, SIDE // BLOCK))
        lab = np.kron(blocks, np.ones((1, BLOCK, BLOCK), int)).astype(np.int64)
        img = np.stack([lab * 40 + 10, 250 - lab * 35, (lab * 97) % 251],
                       axis=-1).astype(np.float32)
        img = np.clip(img + rng.randint(-8, 9, img.shape), 0, 255)
        img = ((img / 255.0) - mean) / std
        batches.append((img.astype(np.float32), lab))
    return batches


@pytest.fixture()  # function-scoped: the torch side is MUTATED by training
def twins():
    """Reference torch DeepLab and our flax DeepLab with identical weights."""
    torch.manual_seed(7)

    def build():
        from models.deeplab import DeepLab as TorchDeepLab

        return TorchDeepLab(backbone="mobilenet", output_stride=16,
                            num_classes=NCLS, sync_bn=False,
                            mc_dropout=False, pretrained=False)

    tmodel = rb.build_reference_model(build)
    # deterministic twin training: disable every dropout site on the torch
    # side; ours runs apply(use_dropout=False)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0

    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        apply_torch_weights, deeplab_state_dict_to_flax)

    model = DeepLab(num_classes=NCLS, backbone="mobilenet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, SIDE, SIDE, 3), jnp.float32),
                           train=False)
    # .copy() is load-bearing: .detach().numpy() views SHARE memory with
    # the torch tensors, and the torch optimizer later updates them in
    # place — without the copy, "ours" would silently start from torch's
    # trained weights
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}
    variables = apply_torch_weights(
        variables, *deeplab_state_dict_to_flax(sd, "mobilenet"))
    return tmodel, model, variables


def _torch_trainer(tmodel, iters_per_epoch, lr=LR, epochs=EPOCHS):
    """The reference's training machinery, imported, not re-derived."""
    loss_mod = rb.import_reference("utils.loss")
    sched_mod = rb.import_reference("utils.lr_scheduler")
    criterion = loss_mod.SegmentationLosses(cuda=False).build_loss("ce")
    optimizer = torch.optim.SGD(
        [{"params": list(tmodel.get_1x_lr_params()), "lr": lr},
         {"params": list(tmodel.get_10x_lr_params()), "lr": lr * 10}],
        momentum=0.9, weight_decay=5e-4, nesterov=False)
    scheduler = sched_mod.LR_Scheduler("poly", lr, epochs, iters_per_epoch)
    return criterion, optimizer, scheduler


def _our_step(model, variables, bn_mode: str = "train", lr=LR,
              epochs=EPOCHS):
    """Deterministic train step from the same components as
    parallel/steps.make_train_step, with dropout off (twin determinism).
    ``bn_mode='eval'`` holds BN at its running statistics (the step-level
    twin; torch side runs model.eval() for its forwards)."""
    from deep_active_semantic_segmentation_tpu.models import (
        lr_multiplier_tree)
    from deep_active_semantic_segmentation_tpu.ops import losses as losses_lib
    from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
        make_schedule)
    from deep_active_semantic_segmentation_tpu.parallel import optim

    loss_fn = losses_lib.build_loss("ce")
    lr_mults = lr_multiplier_tree(variables["params"], "deeplab")
    opt_cfg = optim.SGDConfig(0.9, 5e-4, False)
    train_bn = bn_mode == "train"

    def step(params, stats, opt_state, step_idx, schedule, image, label):
        def compute(p):
            if train_bn:
                out, updates = model.apply(
                    {"params": p, "batch_stats": stats}, image, train=True,
                    use_dropout=False, mutable=["batch_stats"])
                return loss_fn(out, label), updates["batch_stats"]
            out = model.apply({"params": p, "batch_stats": stats}, image,
                              train=False)
            return loss_fn(out, label), stats

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        lr = schedule(step_idx)
        new_params, new_opt = optim.apply_update(
            "SGD", params, grads, opt_state, lr, lr_mults, opt_cfg)
        return new_params, new_stats, new_opt, loss

    schedule = None

    def run(n_steps, batches, iters_per_epoch):
        nonlocal schedule
        schedule = make_schedule("poly", lr, epochs, iters_per_epoch)
        params = variables["params"]
        stats = variables["batch_stats"]
        opt_state = optim.init_opt_state(params, "SGD")
        jstep = jax.jit(step, static_argnames=("schedule",))
        losses = []
        for i in range(n_steps):
            img, lab = batches[i % len(batches)]
            params, stats, opt_state, loss = jstep(
                params, stats, opt_state, i, schedule,
                jnp.asarray(img), jnp.asarray(lab.astype(np.float32)))
            losses.append(float(loss))
        return losses, params, stats

    return run


def test_step_loss_trajectory_matches_reference(twins):
    tmodel, model, variables = twins
    batches = _learnable_batches(3, seed=5)
    n_steps = 12
    iters_per_epoch = len(batches)

    # lr 1e-3: at the canonical 0.01 this frozen-BN twin regime is
    # chaotic (losses explode on BOTH sides), which makes float drift
    # amplify; parity of the math is what's under test here
    criterion, optimizer, scheduler = _torch_trainer(tmodel, iters_per_epoch,
                                                     lr=1e-3)
    tmodel.eval()  # BN at running stats; params still get grads/updates
    torch_losses = []
    for i in range(n_steps):
        img, lab = batches[i % len(batches)]
        epoch, it = divmod(i, iters_per_epoch)
        scheduler(optimizer, it, epoch, 0.0)
        optimizer.zero_grad()
        out = tmodel(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
        loss = criterion(out, torch.from_numpy(lab).float())
        loss.backward()
        optimizer.step()
        torch_losses.append(float(loss))

    run = _our_step(model, variables, bn_mode="eval", lr=1e-3)
    our_losses, _, _ = run(n_steps, batches, iters_per_epoch)

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    # identical init => first losses identical to float-accumulation level
    # (measured 2.4e-7); drift compounds through momentum/10x groups to the
    # 1e-2 scale by mid-trajectory while the curves stay congruent
    assert abs(torch_losses[0] - our_losses[0]) < 5e-5, (
        torch_losses[0], our_losses[0])
    assert np.max(np.abs(torch_losses - our_losses)) < 3e-2, (
        torch_losses, our_losses)
    assert np.mean(np.abs(torch_losses - our_losses)) < 8e-3, (
        torch_losses, our_losses)
    # both must actually descend
    assert our_losses[-1] < our_losses[0] * 0.9
    assert torch_losses[-1] < torch_losses[0] * 0.9


def test_convergence_miou_matches_reference(twins):
    tmodel, model, variables = twins
    train_batches = _learnable_batches(6, seed=11)
    val_batches = _learnable_batches(2, seed=99)
    epochs = 12
    n_steps = epochs * len(train_batches)

    criterion, optimizer, scheduler = _torch_trainer(tmodel, len(train_batches),
                                                     epochs=epochs)
    tmodel.train()
    for i in range(n_steps):
        img, lab = train_batches[i % len(train_batches)]
        epoch, it = divmod(i, len(train_batches))
        scheduler(optimizer, it, epoch, 0.0)
        optimizer.zero_grad()
        out = tmodel(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
        criterion(out, torch.from_numpy(lab).float()).backward()
        optimizer.step()
    tmodel.eval()

    metrics_mod = rb.import_reference("utils.metrics")
    tev = metrics_mod.Evaluator(NCLS)
    for img, lab in val_batches:
        with torch.no_grad():
            pred = tmodel(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
        tev.add_batch(lab, np.argmax(pred.numpy(), axis=1))
    torch_miou = tev.Mean_Intersection_over_Union()

    run = _our_step(model, variables, epochs=epochs)
    _, params, stats = run(n_steps, train_batches, len(train_batches))

    from deep_active_semantic_segmentation_tpu.ops.metrics import Evaluator

    ev = Evaluator(NCLS)
    for img, lab in val_batches:
        logits = model.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(img), train=False)
        ev.add_batch(lab, np.argmax(np.asarray(logits), axis=-1))
    our_miou = ev.Mean_Intersection_over_Union()

    print(f"convergence parity: torch mIoU={torch_miou:.4f} "
          f"ours mIoU={our_miou:.4f}")
    assert torch_miou > 0.5 and our_miou > 0.5, (torch_miou, our_miou)
    assert abs(torch_miou - our_miou) < 0.08, (torch_miou, our_miou)
