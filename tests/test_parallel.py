"""Optimizer parity vs torch, multi-device train/eval steps on the 8-CPU
mesh, and cross-replica batch-norm equivalence (the SyncBN replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from deep_active_semantic_segmentation_tpu.models.unet import UNet
from deep_active_semantic_segmentation_tpu.ops.lr_schedule import constant_schedule
from deep_active_semantic_segmentation_tpu.parallel import optim
from deep_active_semantic_segmentation_tpu.parallel.crossreplica import (
    batch_norm_stats)
from deep_active_semantic_segmentation_tpu.parallel.mesh import (
    make_mesh, shard_batch)
from deep_active_semantic_segmentation_tpu.parallel.steps import (
    init_train_state, make_eval_step, make_train_step)


def _torch_steps(opt_name, params0, grads_seq, lr, **kw):
    p = torch.tensor(params0, requires_grad=True)
    if opt_name == "SGD":
        opt = torch.optim.SGD([p], lr=lr, momentum=kw.get("momentum", 0.9),
                              weight_decay=kw.get("weight_decay", 5e-4),
                              nesterov=kw.get("nesterov", False))
    elif opt_name == "Adam":
        opt = torch.optim.Adam([p], lr=lr, weight_decay=kw.get("weight_decay", 5e-4))
    else:
        opt = torch.optim.RMSprop([p], lr=lr)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    return p.detach().numpy()


def _ours_steps(opt_name, params0, grads_seq, lr, cfg):
    params = {"w": jnp.asarray(params0)}
    state = optim.init_opt_state(params, opt_name)
    mults = {"w": 1.0}
    for g in grads_seq:
        params, state = optim.apply_update(opt_name, params,
                                           {"w": jnp.asarray(g)}, state,
                                           lr, mults, cfg)
    return np.asarray(params["w"])


def test_sgd_matches_torch():
    rng = np.random.RandomState(0)
    p0 = rng.randn(5).astype(np.float32)
    gs = [rng.randn(5).astype(np.float32) for _ in range(4)]
    for nesterov in (False, True):
        ours = _ours_steps("SGD", p0, gs, 0.1,
                           optim.SGDConfig(0.9, 5e-4, nesterov))
        ref = _torch_steps("SGD", p0, gs, 0.1, nesterov=nesterov)
        assert np.allclose(ours, ref, atol=1e-6), nesterov


def test_adam_matches_torch():
    rng = np.random.RandomState(1)
    p0 = rng.randn(5).astype(np.float32)
    gs = [rng.randn(5).astype(np.float32) for _ in range(4)]
    ours = _ours_steps("Adam", p0, gs, 0.01, optim.AdamConfig())
    ref = _torch_steps("Adam", p0, gs, 0.01)
    assert np.allclose(ours, ref, atol=1e-6)


def test_rmsprop_matches_torch():
    rng = np.random.RandomState(2)
    p0 = rng.randn(5).astype(np.float32)
    gs = [rng.randn(5).astype(np.float32) for _ in range(4)]
    ours = _ours_steps("RMSprop", p0, gs, 0.001, optim.RMSpropConfig())
    ref = _torch_steps("RMSprop", p0, gs, 0.001)
    assert np.allclose(ours, ref, atol=1e-6)


def test_lr_multiplier_applied():
    p0 = np.ones(3, np.float32)
    g = np.ones(3, np.float32)
    params = {"a": jnp.asarray(p0), "b": jnp.asarray(p0)}
    state = optim.init_opt_state(params, "SGD")
    new_params, _ = optim.sgd_update(params, {"a": jnp.asarray(g),
                                              "b": jnp.asarray(g)},
                                     state, 0.1, {"a": 1.0, "b": 10.0},
                                     optim.SGDConfig(0.0, 0.0, False))
    assert np.allclose(np.asarray(new_params["a"]), 1.0 - 0.1)
    assert np.allclose(np.asarray(new_params["b"]), 1.0 - 1.0)


def test_train_step_on_mesh_decreases_loss():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    model = UNet(in_channels=3, num_classes=4)
    state = init_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    mults = jax.tree_util.tree_map(lambda _: 1.0, state.params)
    step = make_train_step(model, schedule=constant_schedule(0.05),
                           lr_mults=mults, optimizer="SGD", mesh=mesh)
    rng = jax.random.PRNGKey(42)
    np_rng = np.random.RandomState(0)
    image = np_rng.rand(8, 16, 16, 3).astype(np.float32)
    label = np_rng.randint(0, 4, size=(8, 16, 16)).astype(np.float32)
    batch = shard_batch(mesh, {"image": image, "label": label})
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_eval_step_confusion_and_partial_batch_loss():
    mesh = make_mesh()
    model = UNet(in_channels=3, num_classes=4)
    state = init_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    ev = make_eval_step(model, 4, mesh=mesh)
    np_rng = np.random.RandomState(1)
    image = np_rng.rand(8, 16, 16, 3).astype(np.float32)
    label = np_rng.randint(0, 4, size=(8, 16, 16)).astype(np.float32)
    label[5:] = 255.0  # padded tail
    batch = shard_batch(mesh, {"image": image, "label": label})
    out = ev(state, batch, 5.0)
    cm = np.asarray(out["confusion"])
    assert cm.sum() == 5 * 16 * 16  # ignored padded samples contribute nothing
    assert np.isfinite(float(out["loss"]))


def test_cross_replica_bn_stats_match_global():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    np_rng = np.random.RandomState(3)
    x = np_rng.randn(16, 4, 4, 3).astype(np.float32)

    def per_device(xs):
        return batch_norm_stats(xs, axis_name="data")

    mean_sm, var_sm = shard_map(per_device, mesh=mesh,
                                in_specs=P("data"),
                                out_specs=P())(x)
    mean_ref = x.mean(axis=(0, 1, 2))
    var_ref = x.var(axis=(0, 1, 2))
    assert np.allclose(np.asarray(mean_sm), mean_ref, atol=1e-5)
    assert np.allclose(np.asarray(var_sm), var_ref, atol=1e-5)


def test_train_step_bf16_and_remat_variants():
    mesh = make_mesh()
    model = UNet(in_channels=3, num_classes=4)
    np_rng = np.random.RandomState(7)
    image = np_rng.rand(8, 16, 16, 3).astype(np.float32)
    label = np_rng.randint(0, 4, size=(8, 16, 16)).astype(np.float32)
    batch = shard_batch(mesh, {"image": image, "label": label})
    rng = jax.random.PRNGKey(0)

    losses = {}
    for name, kw in [("f32", {}), ("bf16", {"compute_dtype": jnp.bfloat16}),
                     ("remat", {"remat": True})]:
        state = init_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3),
                                 mesh=mesh)
        mults = jax.tree_util.tree_map(lambda _: 1.0, state.params)
        step = make_train_step(model, schedule=constant_schedule(0.05),
                               lr_mults=mults, optimizer="SGD", mesh=mesh,
                               **kw)
        state, metrics = step(state, batch, rng)
        losses[name] = float(metrics["loss"])
        # master state stays f32
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(state.params))
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(state.batch_stats))
    assert abs(losses["remat"] - losses["f32"]) < 1e-6  # remat is exact
    assert abs(losses["bf16"] - losses["f32"]) < 0.05   # bf16 approximates


def test_dual_train_step_bf16_and_remat_variants():
    """The accuracy-predictor step honors compute_dtype/remat like the
    single-head step: master state stays f32, bf16 loss approximates f32,
    remat is exact."""
    from deep_active_semantic_segmentation_tpu.models.accuracy_predictor import (
        DeepLabAccuracyPredictor)
    from deep_active_semantic_segmentation_tpu.parallel.steps import (
        make_dual_train_step)

    mesh = make_mesh()
    model = DeepLabAccuracyPredictor(num_classes=4, backbone="mobilenet",
                                     output_stride=16)
    np_rng = np.random.RandomState(9)
    image = np_rng.rand(8, 33, 33, 3).astype(np.float32)
    label = np_rng.randint(0, 4, size=(8, 33, 33)).astype(np.float32)
    batch = shard_batch(mesh, {"image": image, "label": label})
    rng = jax.random.PRNGKey(0)

    losses = {}
    for name, kw in [("f32", {}), ("bf16", {"compute_dtype": jnp.bfloat16}),
                     ("remat", {"remat": True})]:
        state = init_train_state(model, jax.random.PRNGKey(0), (1, 33, 33, 3),
                                 mesh=mesh)
        mults = jax.tree_util.tree_map(lambda _: 1.0, state.params)
        step = make_dual_train_step(model, schedule=constant_schedule(0.05),
                                    lr_mults=mults, optimizer="SGD",
                                    mesh=mesh, **kw)
        state, metrics = step(state, batch, rng, jnp.float32(1.0),
                              jnp.float32(0.3))
        losses[name] = float(metrics["loss"])
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(state.params))
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(state.batch_stats))
    assert abs(losses["remat"] - losses["f32"]) < 1e-6
    assert abs(losses["bf16"] - losses["f32"]) < 0.05


def _run_scan_vs_sequential(compute_dtype):
    """Shared harness: k sequential single-step dispatches vs ONE
    scan_steps=k program, same epoch rng / batches / init. Returns
    (seq_losses, scan_losses, seq_state, scan_state)."""
    model = UNet(in_channels=3, num_classes=4)
    np_rng = np.random.RandomState(7)
    batches = [{"image": np_rng.rand(4, 16, 16, 3).astype(np.float32),
                "label": np_rng.randint(0, 4, (4, 16, 16)).astype(np.float32)}
               for _ in range(4)]
    rng = jax.random.PRNGKey(11)
    sched_dyn = jnp.asarray([100.0, 4.0], jnp.float32)

    def build(scan_steps):
        st = init_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
        step = make_train_step(
            model, schedule=constant_schedule(0.05),
            lr_mults=jax.tree_util.tree_map(lambda _: 1.0, st.params),
            optimizer="SGD", compute_dtype=compute_dtype,
            dynamic_schedule=True, scan_steps=scan_steps)
        return st, step

    st1, single = build(1)
    seq_losses = []
    for b in batches:
        st1, m = single(st1, b, rng, sched_dyn)
        seq_losses.append(float(m["loss"]))

    st4, multi = build(4)
    st4, ms = multi(st4, tuple(batches), rng, sched_dyn)
    assert int(st4.step) == len(batches)
    return (np.asarray(seq_losses, np.float32),
            np.asarray(ms["loss"], np.float32), st1, st4)


def test_scan_steps_matches_sequential_singles():
    """make_train_step(scan_steps=k) — k optimizer steps fused into one
    lax.scan program — must be numerically equivalent to k sequential
    single-step dispatches sharing the same epoch rng (the trainer's
    contract: constant rng per epoch, per-step fold key is state.step).
    NOT bit-identical: XLA compiles the scanned body differently from the
    standalone step program, so rounding differs at the last ULP. The
    two-dtype contract (each half of what 'numerically equivalent'
    means):

    * f32 — the MATH is identical: losses and every param leaf agree to
      ~1 ULP after 4 steps (measured max |dparam| 1.2e-7).
    * bf16 (the trainer's default) — ULP differences compound
      chaotically through SGD, so param trajectories DECORRELATE (leaf
      drift reaches ~0.3x the leaf's own 4-step update); the stable
      observable is the loss stream, asserted at bf16 tolerance. The
      trainer-level learning-equivalence test lives in
      test_end_to_end.test_trainer_scan_steps_matches_single_steps.

    Covers the dynamic-schedule variant the engine uses and asserts the
    RNG stream matches exactly (step counter advances identically)."""
    # -- f32: trajectory-identical to ULP -----------------------------------
    seq, scan, st1, st4 = _run_scan_vs_sequential(jnp.float32)
    np.testing.assert_allclose(scan, seq, rtol=2e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st1.batch_stats),
                    jax.tree_util.tree_leaves(st4.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # -- bf16: loss stream within bf16 tolerance -----------------------------
    seq, scan, _, _ = _run_scan_vs_sequential(jnp.bfloat16)
    np.testing.assert_allclose(scan, seq, rtol=2e-3, atol=1e-5)


def test_scan_steps_on_mesh():
    """scan_steps composes with the mesh path: per-batch shardings wrap in
    a k-tuple and the scanned program runs on the 8-device mesh."""
    mesh = make_mesh()
    model = UNet(in_channels=3, num_classes=4)
    state = init_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    step = make_train_step(
        model, schedule=constant_schedule(0.05),
        lr_mults=jax.tree_util.tree_map(lambda _: 1.0, state.params),
        optimizer="SGD", mesh=mesh, scan_steps=2)
    np_rng = np.random.RandomState(0)
    batches = tuple(shard_batch(mesh, {
        "image": np_rng.rand(8, 16, 16, 3).astype(np.float32),
        "label": np_rng.randint(0, 4, (8, 16, 16)).astype(np.float32)})
        for _ in range(2))
    state, ms = step(state, batches, jax.random.PRNGKey(1))
    assert np.asarray(ms["loss"]).shape == (2,)
    assert int(state.step) == 2
