"""Run-directory savers (parity: reference utils/saver.py:10-123).

Directory layout and text artifacts are byte-compatible with the reference:
``<RUNS>/<experiment_group>/<checkname>/run_{pct:04d}/`` for active runs
with ``selections.txt`` (``path[,r,c,h,w...]`` lines, saver.py:68-78),
``best_pred.txt``, ``parameters.txt``; ``experiment_{n}`` dirs with
cross-experiment ``model_best`` promotion for passive runs
(saver.py:96-122). Checkpoints are flax msgpack payloads named
``checkpoint.ckpt`` / ``best.ckpt`` instead of torch ``.pth.tar``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import asdict, is_dataclass

from deep_active_semantic_segmentation_tpu import constants
from deep_active_semantic_segmentation_tpu.utils.checkpoint import save_checkpoint

CHECKPOINT_NAME = "checkpoint.ckpt"
BEST_NAME = "best.ckpt"


def _args_dict(args):
    if is_dataclass(args):
        return asdict(args)
    return vars(args)


class Saver:
    def __init__(self, args, experiment_group=None, remove_existing=False,
                 runs_root=None):
        self.args = args
        if experiment_group is None:
            experiment_group = _args_dict(args)["dataset"]
        root = runs_root or constants.RUNS
        self.directory = os.path.join(root, experiment_group,
                                      _args_dict(args)["checkname"])
        self.experiment_dir = self.directory
        if remove_existing and os.path.exists(self.experiment_dir):
            shutil.rmtree(self.experiment_dir)
        os.makedirs(self.experiment_dir, exist_ok=True)

    def save_checkpoint(self, state, epoch, best_pred, filename=CHECKPOINT_NAME):
        save_checkpoint(os.path.join(self.experiment_dir, filename), state,
                        epoch, best_pred)

    def save_experiment_config(self):
        with open(os.path.join(self.experiment_dir, "parameters.txt"), "w") as f:
            f.write(json.dumps(_args_dict(self.args), indent=4, sort_keys=True,
                               default=str))


class ActiveSaver(Saver):
    """Per-AL-round run_{pct:04d} directories (saver.py:43-78)."""

    def __init__(self, args, num_of_labeled_samples, experiment_group=None,
                 runs_root=None):
        super().__init__(args, experiment_group=experiment_group,
                         runs_root=runs_root)
        self.experiment_dir = os.path.join(
            self.directory, f"run_{num_of_labeled_samples:04d}")
        os.makedirs(self.experiment_dir, exist_ok=True)

    def save_checkpoint(self, state, epoch, best_pred, is_best,
                        filename=CHECKPOINT_NAME):
        save_checkpoint(os.path.join(self.experiment_dir, filename), state,
                        epoch, best_pred)
        if is_best:
            with open(os.path.join(self.experiment_dir, "best_pred.txt"), "w") as f:
                f.write(str(best_pred))
                f.write(f"\n{epoch}")
            save_checkpoint(os.path.join(self.experiment_dir, BEST_NAME),
                            state, epoch, best_pred)

    def save_active_selections(self, paths, regions=None):
        """selections.txt — the scientific checkpoint (saver.py:68-78)."""
        filename = os.path.join(self.experiment_dir, "selections.txt")
        with open(filename, "w") as f:
            if regions:
                for p, region in zip(paths, regions):
                    region_line = ",".join(
                        ",".join(str(i) for i in r) for r in region)
                    f.write(p.decode("utf-8") + "," + region_line + "\n")
            else:
                for p in paths:
                    f.write(p.decode("utf-8") + "\n")


class PassiveSaver(Saver):
    """experiment_{n} dirs + global model_best promotion (saver.py:81-123)."""

    def __init__(self, args, runs_root=None):
        super().__init__(args, runs_root=runs_root)
        self.runs = sorted(glob.glob(os.path.join(self.directory, "experiment_*")))
        run_id = int(self.runs[-1].split("_")[-1]) + 1 if self.runs else 0
        self.experiment_dir = os.path.join(self.directory, f"experiment_{run_id}")
        os.makedirs(self.experiment_dir, exist_ok=True)

    def save_checkpoint(self, state, epoch, best_pred, is_best,
                        filename=CHECKPOINT_NAME):
        filepath = os.path.join(self.experiment_dir, filename)
        save_checkpoint(filepath, state, epoch, best_pred)
        if not is_best:
            return
        with open(os.path.join(self.experiment_dir, "best_pred.txt"), "w") as f:
            f.write(str(best_pred))
            f.write(f"\n{epoch}")
        previous = [0.0]
        for run in self.runs:
            path = os.path.join(run, "best_pred.txt")
            if os.path.exists(path):
                with open(path, "r") as f:
                    previous.append(float(f.readline()))
        if best_pred > max(previous):
            shutil.copyfile(filepath,
                            os.path.join(self.directory, "model_best.ckpt"))
