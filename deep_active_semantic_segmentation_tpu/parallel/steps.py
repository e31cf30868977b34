"""Jitted train / eval step factories over a device mesh.

The reference's per-batch path (active_train.py:96-110: host->GPU copy,
DataParallel scatter, forward, loss, backward, SGD step, per-batch `.item()`)
becomes ONE jitted function: batch sharded over the ``data`` mesh axis,
parameters replicated, XLA inserting the gradient all-reduce and computing
batch-norm statistics over the global batch (the sync_batchnorm
replacement, SURVEY.md section 5.8). The eval step additionally accumulates
the confusion matrix on device — a single host transfer per epoch instead
of per batch (active_train.py:159-163).

Loss semantics preserve the reference's partial-final-batch behavior: train
pools are padded to batch multiples (as the reference does), and the eval
loss uses the true ``nvalid`` as the ``batch_average`` divisor so padded
ignore-labeled duplicates change nothing.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax.struct
import jax
import jax.numpy as jnp

from deep_active_semantic_segmentation_tpu.ops import losses as losses_lib
from deep_active_semantic_segmentation_tpu.ops.metrics import confusion_matrix
from deep_active_semantic_segmentation_tpu.parallel import optim
from deep_active_semantic_segmentation_tpu.parallel.mesh import (
    batch_sharding, replicated_sharding)


def _ingest_wire(batch):
    """Device half of the uint8 train/eval wire (data/loader.py,
    cfg.uint8_wire): normalize uint8 images with the exact host Normalize
    f32 math and cast integer labels to f32 once on device. Float inputs
    pass through untouched, so every step below accepts BOTH wires."""
    from deep_active_semantic_segmentation_tpu.selection.kernels import (
        normalize_on_device)

    image = normalize_on_device(batch["image"])
    label = batch["label"]
    if not jnp.issubdtype(label.dtype, jnp.floating):
        label = label.astype(jnp.float32)
    return image, label


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(model, rng, input_shape, optimizer: str = "SGD",
                     train: bool = False, mesh=None) -> TrainState:
    variables = model.init({"params": rng}, jnp.zeros(input_shape, jnp.float32),
                           train=train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=optim.init_opt_state(params, optimizer),
                       step=jnp.zeros((), jnp.int32))
    if mesh is not None:
        state = place_replicated(state, mesh)
    return state


def place_replicated(tree, mesh):
    """Pin a pytree to the mesh's replicated sharding ONCE.

    Critical on single-controller backends (incl. the axon relay): a jitted
    step with explicit in_shardings re-shards any argument whose current
    sharding differs, and that re-layout can round-trip through the host
    per leaf — measured at seconds per step for a param tree. Placing the
    state (and any freshly-loaded checkpoint) with the exact sharding the
    step expects makes every subsequent call zero-copy.
    """
    return jax.device_put(tree, replicated_sharding(mesh))


def make_train_step(model, *, loss_mode: str = "ce",
                    class_weights=None, schedule: Callable,
                    lr_mults, optimizer: str = "SGD",
                    opt_cfg=None, mesh=None,
                    batch_average: bool = True,
                    spatial: bool = False,
                    compute_dtype=jnp.float32,
                    remat: bool = False,
                    dynamic_schedule: bool = False,
                    scan_steps: int = 1) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``dynamic_schedule=True`` adds a 4th operand — a (2,) f32
    ``[total_iters, iters_per_epoch]`` array forwarded to the schedule —
    so the per-AL-round change in labeled-set size never recompiles the
    step (the engine builds each step ONCE per run; SURVEY hard part #6).

    ``spatial=True`` additionally shards the image height over the mesh's
    'spatial' axis (2-D data x spatial sharding; XLA inserts the conv halo
    exchanges) — used for full-resolution inputs and the multi-chip dryrun.

    ``compute_dtype=bfloat16`` runs the forward/backward in bf16 against
    f32 master params/optimizer state (+~20% step throughput on v5e for
    DeepLab); loss and batch statistics stay f32.

    ``remat=True`` rematerializes the forward under ``jax.checkpoint``,
    trading FLOPs for activation memory (larger batches / resolutions).

    ``scan_steps=k`` (k>1) returns a MULTI-step function
    (state, (batch_0, ..., batch_{k-1}), rng[, sched_dyn]) -> (state,
    metrics-with-leading-k) that runs the identical step_fn k times under
    one ``lax.scan`` — one program dispatch per k optimizer steps, with
    per-step metrics stacked. NUMERICALLY equivalent (same RNG stream —
    the per-step fold key is ``state.step``, which the scan carries — and
    the same optimizer math) to k single-step calls sharing the same
    ``rng``, but NOT bit-identical: XLA schedules the scanned body
    differently from the standalone step program, so low-precision
    (bf16) rounding diverges at the ULP level from step 2 on. The
    contract test asserts closeness at a bf16-appropriate tolerance
    (tests/test_parallel.py::test_scan_steps_matches_sequential_singles).
    """
    loss_fn = losses_lib.build_loss(loss_mode, class_weights=class_weights,
                                    batch_average=batch_average)
    if opt_cfg is None:
        opt_cfg = optim.SGDConfig() if optimizer == "SGD" else (
            optim.AdamConfig() if optimizer == "Adam" else optim.RMSpropConfig())

    def step_fn(state: TrainState, batch: Dict, rng, sched_dyn=None) -> tuple:
        rng = jax.random.fold_in(rng, state.step)
        wire_image, wire_label = _ingest_wire(batch)

        def forward(params, image):
            if compute_dtype != jnp.float32:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype), params)
                image = image.astype(compute_dtype)
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})

        if remat:
            forward = jax.checkpoint(forward)

        def compute_loss(params):
            out, updates = forward(params, wire_image)
            loss = loss_fn(out, wire_label)
            # batch statistics stay in the master (f32) dtype
            stats = jax.tree_util.tree_map(
                lambda a, b: b.astype(a.dtype), state.batch_stats,
                updates["batch_stats"])
            return loss, stats

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, state.params)
        lr = schedule(state.step, sched_dyn)
        new_params, new_opt = optim.apply_update(
            optimizer, state.params, grads, state.opt_state, lr, lr_mults,
            opt_cfg)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "lr": lr}

    if scan_steps > 1:
        # k steps fused into ONE program: a lax.scan of the identical
        # step_fn over a tuple of k batches (stacked on device — the
        # per-batch host->device transfers and their prefetch overlap are
        # unchanged). Numerically equivalent to k sequential dispatches
        # (the trainer passes a constant rng per epoch and step_fn folds
        # in state.step, which the scan carries), though bf16 rounding
        # differs at ULP level — see the docstring. The point is dispatch
        # amortization: on a relay-attached chip every program dispatch
        # costs milliseconds of host latency, and at small geometries
        # (early AL rounds, tests) dispatch dominates the device time.
        # Consumed by Trainer.training via cfg.scan_steps.
        def multi_fn(state, batches, rng, sched_dyn=None):
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *batches)

            def body(st, bt):
                return step_fn(st, bt, rng, sched_dyn)

            return jax.lax.scan(body, state, stacked)

        if not dynamic_schedule:
            def step_fn_static(state, batches, rng):
                return multi_fn(state, batches, rng, None)
        else:
            step_fn_static = multi_fn
    elif not dynamic_schedule:
        def step_fn_static(state, batch, rng):
            return step_fn(state, batch, rng, None)
    else:
        step_fn_static = step_fn

    if mesh is None:
        return jax.jit(step_fn_static, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    if spatial:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data", "spatial"))
    else:
        data = batch_sharding(mesh)
    batch_in = {"image": data, "label": data}
    if scan_steps > 1:
        batch_in = (batch_in,) * scan_steps
    in_shardings = ((repl, batch_in, repl, repl) if dynamic_schedule
                    else (repl, batch_in, repl))
    return jax.jit(step_fn_static, donate_argnums=(0,),
                   in_shardings=in_shardings,
                   out_shardings=(repl, repl))


def _dual_unet_target(seg_logits, label):
    """Per-pixel correctness target for the error head
    (accuracy_predictor_train.py:106-110): 1 where the seg head is right,
    255 where the ground truth is ignored."""
    pred = jnp.argmax(seg_logits, axis=-1)
    correct = (pred == label.astype(jnp.int32)).astype(jnp.float32)
    return jnp.where(label == 255.0, 255.0, correct)


def make_dual_train_step(model, *, loss_mode: str = "ce", class_weights=None,
                         unet_class_weights=None, schedule: Callable,
                         lr_mults, optimizer: str = "SGD", opt_cfg=None,
                         mesh=None, compute_dtype=jnp.float32,
                         remat: bool = False,
                         dynamic_schedule: bool = False) -> Callable:
    """Two-headed train step (accuracy_predictor_train.py:81-155):
    loss = w_dl * CE_seg + w_un * CE_unet(correctness target).
    ``compute_dtype`` / ``remat`` / ``dynamic_schedule`` behave as in
    :func:`make_train_step` (the schedule operand comes before w_dl)."""
    seg_loss = losses_lib.build_loss(loss_mode, class_weights=class_weights)
    err_loss = losses_lib.build_loss(loss_mode,
                                     class_weights=unet_class_weights)
    if opt_cfg is None:
        opt_cfg = optim.SGDConfig() if optimizer == "SGD" else optim.AdamConfig()

    def step_fn(state: TrainState, batch: Dict, rng, w_dl, w_un,
                sched_dyn=None):
        rng = jax.random.fold_in(rng, state.step)
        wire_image, wire_label = _ingest_wire(batch)

        def forward(params, image):
            if compute_dtype != jnp.float32:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(compute_dtype), params)
                image = image.astype(compute_dtype)
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})

        if remat:
            forward = jax.checkpoint(forward)

        def compute_loss(params):
            (seg, err), updates = forward(params, wire_image)
            unet_target = _dual_unet_target(jax.lax.stop_gradient(seg),
                                            wire_label)
            loss_dl = seg_loss(seg, wire_label)
            loss_un = err_loss(err, unet_target)
            loss = w_dl * loss_dl + w_un * loss_un
            stats = jax.tree_util.tree_map(
                lambda a, b: b.astype(a.dtype), state.batch_stats,
                updates["batch_stats"])
            return loss, (stats, loss_dl, loss_un)

        (loss, (new_stats, loss_dl, loss_un)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, state.params)
        lr = schedule(state.step, sched_dyn)
        new_params, new_opt = optim.apply_update(
            optimizer, state.params, grads, state.opt_state, lr, lr_mults,
            opt_cfg)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "loss_dl": loss_dl,
                           "loss_un": loss_un, "lr": lr}

    if not dynamic_schedule:
        def step_fn_static(state, batch, rng, w_dl, w_un):
            return step_fn(state, batch, rng, w_dl, w_un, None)
    else:
        step_fn_static = step_fn

    if mesh is None:
        return jax.jit(step_fn_static, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    batch_in = {"image": data, "label": data}
    in_shardings = ((repl, batch_in, repl, repl, repl, repl)
                    if dynamic_schedule
                    else (repl, batch_in, repl, repl, repl))
    return jax.jit(step_fn_static, donate_argnums=(0,),
                   in_shardings=in_shardings,
                   out_shardings=(repl, repl))


def make_dual_eval_step(model, num_classes: int, *, loss_mode: str = "ce",
                        class_weights=None, unet_class_weights=None,
                        mesh=None) -> Callable:
    """Two-headed eval step (accuracy_predictor_train.py:157-241): both
    losses, the seg confusion matrix, and the error-head confusion."""
    seg_loss = losses_lib.build_loss(loss_mode, class_weights=class_weights,
                                     batch_average=False)
    err_loss = losses_lib.build_loss(loss_mode,
                                     class_weights=unet_class_weights,
                                     batch_average=False)

    def step_fn(state: TrainState, batch: Dict, nvalid, w_dl, w_un) -> Dict:
        image, label = _ingest_wire(batch)
        seg, err = model.apply({"params": state.params,
                                "batch_stats": state.batch_stats},
                               image, train=False)
        unet_target = _dual_unet_target(seg, label)
        loss_dl = seg_loss(seg, label) / nvalid
        loss_un = err_loss(err, unet_target) / nvalid
        pred = jnp.argmax(seg, axis=-1)
        err_pred = jnp.argmax(err, axis=-1)
        return {"loss": w_dl * loss_dl + w_un * loss_un,
                "loss_dl": loss_dl, "loss_un": loss_un,
                "confusion": confusion_matrix(label, pred, num_classes),
                "unet_confusion": confusion_matrix(unet_target, err_pred, 2),
                "pred": pred, "err_pred": err_pred,
                "unet_target": unet_target}

    if mesh is None:
        return jax.jit(step_fn)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(repl, {"image": data, "label": data},
                                 repl, repl, repl),
                   out_shardings=repl)


def make_eval_step(model, num_classes: int, *, loss_mode: str = "ce",
                   class_weights=None, mesh=None) -> Callable:
    """Build the jitted eval step: (state, batch, nvalid) ->
    {loss, confusion, pred}; loss divides by the true nvalid (the
    reference's partial-batch batch_average)."""
    loss_fn = losses_lib.build_loss(loss_mode, class_weights=class_weights,
                                    batch_average=False)

    def step_fn(state: TrainState, batch: Dict, nvalid) -> Dict:
        image, label = _ingest_wire(batch)
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          image, train=False)
        loss = loss_fn(out, label) / nvalid
        pred = jnp.argmax(out, axis=-1)
        cm = confusion_matrix(label, pred, num_classes)
        return {"loss": loss, "confusion": cm, "pred": pred}

    if mesh is None:
        return jax.jit(step_fn)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(repl, {"image": data, "label": data}, repl),
                   out_shardings=repl)
