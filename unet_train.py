"""Standalone UNet trainer for the SEM binary-segmentation dataset.

Parity: reference unet_train.py — UNet(1, 2), RMSprop lr=0.001, plain CE,
per-epoch pixel-accuracy reporting, validation every 5 epochs.
"""

import argparse

import jax
import numpy as np

from deep_active_semantic_segmentation_tpu.data.loader import Loader
from deep_active_semantic_segmentation_tpu.data.sem import SEMData
from deep_active_semantic_segmentation_tpu.models.unet import UNet
from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
    constant_schedule)
from deep_active_semantic_segmentation_tpu.parallel import optim
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh
from deep_active_semantic_segmentation_tpu.parallel.steps import (
    init_train_state, make_eval_step, make_train_step)


def get_loss_and_accuracy(eval_step, state, loader):
    """reference unet_train.py:47-61: mean loss + mean pixel accuracy."""
    total_acc, total_loss, batches = 0.0, 0.0, 0
    for batch in loader:
        out = eval_step(state, {"image": batch["image"],
                                "label": batch["label"]},
                        np.float32(batch["nvalid"]))
        pred = np.asarray(out["pred"])[: batch["nvalid"]]
        mask = np.asarray(batch["label"])[: batch["nvalid"]]
        total_acc += float(np.mean(pred == mask))
        total_loss += float(out["loss"]) * batch["nvalid"]  # CE mean per batch
        batches += 1
    return total_acc / max(batches, 1), total_loss / max(batches, 1)


def main(argv=None, dataset_root=None, epochs=2000, crop_size=512,
         batch_size=2):
    parser = argparse.ArgumentParser(description="TPU SEM UNet training")
    parser.add_argument("--epochs", type=int, default=epochs)
    parser.add_argument("--crop-size", type=int, default=crop_size)
    parser.add_argument("--batch-size", type=int, default=batch_size)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--num-devices", type=int, default=None)
    ns = parser.parse_args(argv)

    mesh = make_mesh(ns.num_devices)
    train_set = SEMData(ns.crop_size, "train", dataset_root=dataset_root)
    val_set = SEMData(ns.crop_size, "val", dataset_root=dataset_root)
    train_loader = Loader(train_set, ns.batch_size, shuffle=True, seed=0)
    val_loader = Loader(val_set, 1, shuffle=False)

    model = UNet(in_channels=1, num_classes=2)
    state = init_train_state(model, jax.random.PRNGKey(0),
                             (1, ns.crop_size, ns.crop_size, 1),
                             optimizer="RMSprop")
    mults = jax.tree_util.tree_map(lambda _: 1.0, state.params)
    train_step = make_train_step(model, schedule=constant_schedule(ns.lr),
                                 lr_mults=mults, optimizer="RMSprop",
                                 opt_cfg=optim.RMSpropConfig(), mesh=mesh,
                                 batch_average=False)
    eval_step = make_eval_step(model, 2, mesh=mesh)

    rng = jax.random.PRNGKey(1)
    print("Initializing Training!")
    for i in range(ns.epochs):
        for batch in train_loader:
            state, _ = train_step(state, {"image": batch["image"],
                                          "label": batch["label"]}, rng)
        train_acc, train_loss = get_loss_and_accuracy(eval_step, state,
                                                      train_loader)
        print("Epoch", i + 1, "Train loss:", train_loss, "Train acc", train_acc)
        if (i + 1) % 5 == 0:
            val_acc, val_loss = get_loss_and_accuracy(eval_step, state,
                                                      val_loader)
            print("Val loss:", val_loss, "val acc:", val_acc)
    return state


if __name__ == "__main__":
    main()
