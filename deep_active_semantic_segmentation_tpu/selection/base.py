"""Selector base + the model handle selectors score with.

Parity: reference active_selection/base.py:1-6 (store/crop/batch triple).
``ModelBundle`` replaces the reference's mutable DataParallel module: an
immutable (model, params, batch_stats) triple. The flax module config is
hashable, so jitted scoring kernels take it as a static argument and the
jit cache keys on (architecture, batch shape) — one compile per AL run,
reused across rounds.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import numpy as np

# Matmul/conv precision for the DETERMINISTIC scoring forwards (CEAL,
# accuracy family, core-set/max-subset feature extraction). TPU default
# matmul precision (one bf16 pass) costs selection fidelity: measured
# top-8 agreement with the reference CEAL-confidence ranking drops to 88%
# at 'default' and recovers to 100% at 'high' (3-pass bf16) — see
# tests/test_reference_agreement.py and BASELINE.md. These scorers are a
# single forward per image (vs 20 for MC voting), so the ~3x MXU cost is
# a negligible share of an AL round; MC vote-entropy keeps 'default'
# (argmax votes are robust to matmul rounding, and it is the throughput
# headline). Override with DASS_SCORING_PRECISION or cfg.scoring_precision.
SCORING_PRECISION = os.environ.get("DASS_SCORING_PRECISION", "high")

# Compute dtype for the MC vote-entropy forwards (MC-dropout / MC-noise).
# Votes are per-pixel argmaxes — bf16 rounding perturbs them far less than
# the MC sampling noise itself (measured on TPU: same-seed bf16-vs-f32
# entropy delta 0.11 bits mean vs an f32 seed-to-seed band of 0.48;
# Spearman 1.0 / top-8 8/8 rank agreement — BASELINE.md). The throughput
# win is modest (+4.5%, 109.5 -> 114.4 imgs/s): at 'default' matmul
# precision XLA already runs f32 convs as single bf16 MXU passes, so bf16
# storage only halves the activations' HBM traffic. 'auto' resolves to
# bfloat16 on TPU and float32 elsewhere (host XLA emulates bf16, slower).
MC_SCORING_DTYPE = os.environ.get("DASS_MC_SCORING_DTYPE", "auto")


def mc_scoring_dtype() -> str:
    """Resolve MC_SCORING_DTYPE at call time (the backend must not be
    touched at import — dryrun_multichip re-pins the platform first)."""
    if MC_SCORING_DTYPE != "auto":
        return MC_SCORING_DTYPE
    return ("bfloat16" if jax.default_backend() in ("tpu", "axon")
            else "float32")


def scoring_precision(precision: str = None):
    """Context manager pinning matmul precision for deterministic scoring.
    ``precision`` overrides the process default (selectors pass their
    per-instance setting through here, never by mutating the module)."""
    return jax.default_matmul_precision(precision or SCORING_PRECISION)


@dataclass
class ModelBundle:
    model: Any                      # flax nn.Module (hashable config)
    params: Any
    batch_stats: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def model_name(self) -> str:
        return getattr(self.model, "model_name", "model")


class ActiveSelectionBase:
    def __init__(self, dataset_store, crop_size, dataloader_batch_size,
                 mesh=None, scoring_precision=None, mc_dtype=None):
        self.store = dataset_store
        self.crop_size = crop_size
        self.dataloader_batch_size = dataloader_batch_size
        # Per-instance precision policy (None -> process defaults above).
        # Threading these through the instances instead of mutating the
        # module globals keeps two in-process loops with different
        # precisions independent (the accuracy_eval twin-run pattern).
        self._scoring_precision = scoring_precision
        self._mc_dtype = mc_dtype
        # Multi-chip pool scoring: when a >1-device mesh is supplied and the
        # scoring batch divides over it, batches are placed sharded over a
        # flattened 1-D 'pool' axis and the MC sweep runs one shard per
        # device (kernels.mc_vote_entropy_maps_sharded) — the AL hot loop
        # scales out with zero collectives.
        self.mesh = mesh
        self.pool_mesh = None
        if mesh is not None and mesh.devices.size > 1 \
                and dataloader_batch_size % mesh.devices.size == 0:
            from jax.sharding import Mesh

            self.pool_mesh = Mesh(mesh.devices.reshape(-1), ("pool",))

    def precision_scope(self):
        """Matmul-precision scope for this selector's deterministic
        forwards (instance setting, falling back to SCORING_PRECISION)."""
        return scoring_precision(self._scoring_precision)

    def mc_dtype(self) -> str:
        """Compute dtype for this selector's MC vote-entropy forwards."""
        return self._mc_dtype or mc_scoring_dtype()

    def _paths_loader(self, images, include_labels=True,
                      labels_as_mask=None):
        from deep_active_semantic_segmentation_tpu.data.loader import (
            PathsLoader, prefetch_to_device)

        # uint8 fast path: host does geometry only; the scoring kernels
        # normalize on device (kernels.normalize_on_device) with identical
        # f32 math — 4x fewer transfer bytes and the 1-thread host producer
        # sheds its largest per-image cost. labels_as_mask (num_classes)
        # further packs the label plane to the 1-bit valid predicate for
        # kernels that read labels only through valid_mask (the MC sweeps).
        loader = PathsLoader(self.store, images, self.crop_size,
                             self.dataloader_batch_size,
                             include_labels=include_labels,
                             device_normalize=True,
                             labels_as_mask=labels_as_mask)

        pool_mesh = self.pool_mesh

        def build_and_put(chunk):
            import jax

            batch = loader.build_batch(chunk)
            sharding = None
            if pool_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sharding = NamedSharding(pool_mesh, P("pool"))
            out = dict(batch)
            for k in ("image", "label"):
                if k in out:
                    out[k] = (jax.device_put(out[k], sharding)
                              if sharding is not None
                              else jax.device_put(out[k]))
            return out

        # multi-worker host->device prefetch: the feeder enumerates cheap
        # path chunks while worker threads run BOTH the host geometry
        # (the native imresize releases the GIL, so it parallelizes on
        # multi-core TPU-VM hosts) and the latency-bound transfers;
        # batches arrive in order. (The reference blocks on both,
        # num_workers=0 in every selector loop, mc_dropout.py:131-132)
        workers = int(os.environ.get("DASS_PREFETCH_WORKERS", "3"))
        return prefetch_to_device(loader.iter_chunks(), build_and_put,
                                  depth=2, workers=workers)


def collect_scores(loader, score_batch_fn) -> list:
    """Drain a prefetched loader through a per-batch device scorer,
    deferring device->host fetches: every per-batch result starts an async
    copy immediately and is materialized only after the sweep. On a
    latency-bound host link a synchronous np.asarray per batch serializes
    ~0.5 s each behind the kernel; async copies overlap with the next
    batches' compute (see utils/checkpoint._to_host for the same trick)."""
    pending = []
    for batch in loader:
        out = score_batch_fn(batch)
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        pending.append((out, batch["nvalid"]))
    scores = []
    for out, nvalid in pending:
        scores.extend(np.asarray(out)[:nvalid].tolist())
    return scores


def rank_descending(scores, images, selection_count):
    """reference sorted(zip(scores, images), reverse=True)[:k] — stable on
    ties, keeping pool order (python sorted / stable argsort equivalence)."""
    scores = np.asarray(scores, np.float64)
    order = np.argsort(-scores, kind="stable")
    return [images[i] for i in order[:selection_count]]


def rank_ascending(scores, images, selection_count):
    scores = np.asarray(scores, np.float64)
    order = np.argsort(scores, kind="stable")
    return [images[i] for i in order[:selection_count]]
