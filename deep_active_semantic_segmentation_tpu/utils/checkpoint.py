"""Checkpoint serialization for TrainState pytrees.

Replaces torch.save dicts (reference utils/saver.py:54-66,
active_train.py:120-125): the payload keeps the reference's schema —
``{epoch, state_dict, optimizer, best_pred}``.

Two backends, selected by ``DASS_CKPT_BACKEND``:

* ``msgpack`` (default) — one file, flax msgpack trees inside a small
  pickled envelope. Fastest on a latency-bound host link (one write),
  and what the drivers' ``*.ckpt`` artifacts are.
* ``orbax``   — an Orbax StandardCheckpointer directory per checkpoint
  (atomic renames, async-friendly, multi-host aware). The production
  choice for real TPU pods; ``load_checkpoint`` auto-detects a directory
  and reads it back regardless of the env setting.
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

from deep_active_semantic_segmentation_tpu.parallel.steps import TrainState


def _backend() -> str:
    return os.environ.get("DASS_CKPT_BACKEND", "msgpack")


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
    if _backend() == "orbax":
        _save_orbax(path, state, epoch, best_pred, extra)
        return
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
    """Restore into the structure of ``state``; returns (state, payload).
    Backend is auto-detected: a directory is an Orbax checkpoint, a file
    is the msgpack envelope."""
    if os.path.isdir(path):
        return _load_orbax(path, state)
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


# -- Orbax backend ----------------------------------------------------------

def _save_orbax(path: str, state: TrainState, epoch: int, best_pred: float,
                extra: Dict[str, Any] = None) -> None:
    import orbax.checkpoint as ocp

    target = os.path.abspath(path)
    if os.path.exists(target):  # the savers overwrite per validation epoch
        shutil.rmtree(target) if os.path.isdir(target) else os.remove(target)
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": np.asarray(int(state.step)),
        "epoch": np.asarray(int(epoch)),
        "best_pred": np.asarray(float(best_pred)),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(target, payload)
        ckptr.wait_until_finished()


def _load_orbax(path: str, state: TrainState):
    import orbax.checkpoint as ocp

    template = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": np.asarray(0),
        "epoch": np.asarray(0),
        "best_pred": np.asarray(0.0),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), template)
    new_state = TrainState(params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"],
                           step=jax.numpy.asarray(int(restored["step"])))
    payload = {"epoch": int(restored["epoch"]),
               "best_pred": float(restored["best_pred"]),
               "step": int(restored["step"])}
    return new_state, payload
