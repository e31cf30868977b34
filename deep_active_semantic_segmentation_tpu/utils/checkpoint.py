"""Checkpoint serialization for TrainState pytrees.

Replaces torch.save dicts (reference utils/saver.py:54-66,
active_train.py:120-125): the payload keeps the reference's schema —
``{epoch, state_dict, optimizer, best_pred}`` — with the state_dict being
the flax param/batch-stat trees serialized via flax msgpack (fast,
framework-native, no pickle of device arrays).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

from deep_active_semantic_segmentation_tpu.parallel.steps import TrainState


def _to_host(tree):
    """Device->host fetch with overlapped transfers.

    Over the axon relay each array fetch is latency-bound (~0.5 s), so a
    sequential per-leaf np.asarray over a few hundred parameters costs
    minutes. Kick off every copy asynchronously first, then materialize —
    one round-trip of latency total.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return treedef.unflatten([np.asarray(leaf) for leaf in leaves])


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    best_pred: float, extra: Dict[str, Any] = None) -> None:
    payload = {
        "epoch": epoch,
        "state_dict": serialization.to_bytes(
            {"params": _to_host(state.params),
             "batch_stats": _to_host(state.batch_stats)}),
        "optimizer": serialization.to_bytes(_to_host(state.opt_state)),
        "step": int(state.step),
        "best_pred": float(best_pred),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=4)


def load_checkpoint(path: str, state: TrainState):
    """Restore into the structure of ``state``; returns (state, payload)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    model_target = {"params": _to_host(state.params),
                    "batch_stats": _to_host(state.batch_stats)}
    restored = serialization.from_bytes(model_target, payload["state_dict"])
    opt = serialization.from_bytes(_to_host(state.opt_state),
                                   payload["optimizer"])
    new_state = TrainState(params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=opt,
                           step=jax.numpy.asarray(payload.get("step", 0)))
    return new_state, payload
