"""Benchmark harness — MC-dropout pool scoring, end-to-end and kernel.

Headline metric (the reference's hot loop, BASELINE.md): MC-dropout
vote-entropy pool scoring on DeepLab-v3+/MobileNetV2 at 513x513 with
MC_STEPS=20 stochastic forwards per image (reference
active_selection/mc_dropout.py:30-80,173-196), measured two ways:

* kernel — synthetic images resident on device; isolates the fused
  lax.scan + Pallas upsample path (upper bound).
* e2e — a real DirectoryStore of full-res (1024x2048) records swept
  through ActiveSelectionMCDropout.get_vote_entropy_for_images: store
  read, host FixScaleCrop (uint8), prefetched host->device transfer,
  on-device normalize + MC kernel + ranking. On this 1-core relay host
  the e2e number is host-geometry-bound (~27 ms/img single-thread
  resize); the measured host ceiling is reported alongside.

Also reported: MFU for the kernel (XLA cost_analysis flops vs the v5e
bf16 peak) and the bf16 train-step throughput.

Baseline: the reference publishes no numbers; REF_IMGS_PER_SEC=1.5 is the
documented structural estimate (BASELINE.md — ~30 fps single-GPU DeepLab
inference / 20 MC steps, ignoring its per-image python entropy loop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import time

REF_IMGS_PER_SEC = 1.5   # documented estimate, see BASELINE.md
V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip

E2E_IMAGES = 48
E2E_STORE = "/tmp/dass_bench_store"


def _force(x):
    """np.asarray forces real completion — through the axon relay
    block_until_ready can return at enqueue time."""
    import numpy as np

    return np.asarray(x)


def _build_e2e_store():
    import numpy as np

    from deep_active_semantic_segmentation_tpu.data.store import DirectoryStore

    marker = os.path.join(E2E_STORE, f".ready_{E2E_IMAGES}")
    if os.path.exists(marker):
        return DirectoryStore(E2E_STORE)
    store = DirectoryStore(E2E_STORE, readonly=False)
    rng = np.random.RandomState(0)
    keys = []
    for i in range(E2E_IMAGES):
        img = rng.randint(0, 255, size=(1024, 2048, 3), dtype=np.uint8)
        lab = rng.randint(0, 19, size=(1024, 2048)).astype(np.uint8)
        k = f"/leftImg8bit/train/b/img_{i:03d}.png".encode()
        store.put(k, np.dstack((img, lab)))
        keys.append(k)
    store.finalize(keys)
    open(marker, "w").close()
    return DirectoryStore(E2E_STORE)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep_active_semantic_segmentation_tpu import constants
    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.selection.kernels import (
        mc_vote_entropy_maps)

    batch = 8
    side = 513
    num_classes = 19

    model = DeepLab(num_classes=num_classes, backbone="mobilenet",
                    output_stride=16)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng},
                           jnp.zeros((1, side, side, 3), jnp.float32),
                           train=False)
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, side, side, 3), jnp.float32)
    labels = jnp.zeros((batch, side, side), jnp.float32)

    from deep_active_semantic_segmentation_tpu.selection import base as sel_base

    def score(key):
        maps = mc_vote_entropy_maps(model, variables, images, labels, key,
                                    num_classes, constants.MC_STEPS, "dropout",
                                    fused_upsample=True,
                                    compute_dtype=sel_base.mc_scoring_dtype())
        return jnp.mean(maps, axis=(1, 2))

    # --- kernel throughput -------------------------------------------------
    _force(score(jax.random.PRNGKey(2)))  # warmup / compile
    iters = 8
    reps = []
    for rep in range(3):  # median of 3 — the shared chip is noisy
        start = time.perf_counter()
        for i in range(iters):
            out = score(jax.random.PRNGKey(100 * rep + i))
        _force(out)  # device executes FIFO: fetching the last forces all
        reps.append(batch * iters / (time.perf_counter() - start))
    kernel_imgs_per_sec = sorted(reps)[1]

    # --- MFU (kernel) ------------------------------------------------------
    mfu = flops_per_img = None
    try:
        lowered = mc_vote_entropy_maps.lower(
            model, variables, images, labels, jax.random.PRNGKey(2),
            num_classes, constants.MC_STEPS, "dropout", fused_upsample=True,
            compute_dtype=sel_base.mc_scoring_dtype())
        def _flops(lw):
            cost = lw.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0))

        total = _flops(lowered)  # backbone(x1) + scan body(x1) + tail
        # cost_analysis counts the lax.scan BODY once, but since the
        # backbone hoist (selection/kernels.py) the deterministic backbone
        # runs ONCE per batch outside the scan — so executed flops are
        # total + (MC_STEPS-1) * (total - backbone), with the backbone
        # program lowered separately (the entropy tail inside the
        # remainder is <0.1% of a forward).
        from deep_active_semantic_segmentation_tpu.selection import (
            kernels as kernels_mod)

        bb = jax.jit(lambda v, im: model.apply(
            v, im, train=False, backbone_only=True))
        backbone = _flops(bb.lower(
            kernels_mod._cast_floats(variables, sel_base.mc_scoring_dtype()),
            images.astype(sel_base.mc_scoring_dtype())))
        if total > 0 and 0 < backbone < total:
            flops_per_img = (
                total + (constants.MC_STEPS - 1) * (total - backbone)) / batch
            mfu = kernel_imgs_per_sec * flops_per_img / V5E_PEAK_FLOPS
    except Exception:
        pass

    # --- end-to-end pool scoring ------------------------------------------
    from deep_active_semantic_segmentation_tpu.selection.base import ModelBundle
    from deep_active_semantic_segmentation_tpu.selection.mc_dropout import (
        ActiveSelectionMCDropout)

    store = _build_e2e_store()
    paths = store.keys()
    bundle = ModelBundle(model, variables["params"],
                         variables.get("batch_stats", {}))
    selector = ActiveSelectionMCDropout(num_classes, store, side, batch)
    # warmup: one small sweep compiles the (batch, 513) kernel for the e2e
    # geometry and touches the store cache path
    selector.get_vote_entropy_for_images(bundle, paths[:batch], batch, seed=9)
    start = time.perf_counter()
    selector.get_vote_entropy_for_images(bundle, paths, batch, seed=3)
    e2e_imgs_per_sec = len(paths) / (time.perf_counter() - start)

    # host geometry ceiling: the single-thread FixScaleCrop cost that bounds
    # e2e on this 1-core host (real TPU-VM hosts have tens of cores)
    from deep_active_semantic_segmentation_tpu.data import transforms as tr

    rec = np.asarray(store.get(paths[0]))
    fsc = tr.FixScaleCrop(crop_size=side)
    fsc({"image": rec[:, :, :3], "label": rec[:, :, 3]})  # warm native lib
    t0 = time.perf_counter()
    for _ in range(6):
        fsc({"image": rec[:, :, :3], "label": rec[:, :, 3]})
    host_ceiling = 6 / (time.perf_counter() - t0)

    # relay transfer ceiling: measured host->device bandwidth for the uint8
    # crop wire format the e2e path ships (image+label per record).  e2e is
    # bounded by min(host geometry, relay transfer, kernel); round 2 only
    # asserted the relay bound — this measures it.
    # the e2e path ships uint8 RGB + the packed 1-bit valid mask
    # (PathsLoader labels_as_mask): 3.125 bytes/pixel
    wire_img = np.zeros((batch, side, side, 3), np.uint8)
    wire_mask = np.zeros((batch, side, (side + 7) // 8), np.uint8)
    reduce = jax.jit(lambda a, b: jnp.sum(a, dtype=jnp.int32)
                     + jnp.sum(b, dtype=jnp.int32))
    _force(reduce(jax.device_put(wire_img), jax.device_put(wire_mask)))
    t0 = time.perf_counter()
    xfer_reps = 3
    for _ in range(xfer_reps):
        _force(reduce(jax.device_put(wire_img), jax.device_put(wire_mask)))
    relay_ceiling = batch * xfer_reps / (time.perf_counter() - t0)

    # --- train step throughput (bf16 default) ------------------------------
    train_imgs_per_sec = None
    try:
        from deep_active_semantic_segmentation_tpu.models import (
            lr_multiplier_tree)
        from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
            constant_schedule)
        from deep_active_semantic_segmentation_tpu.parallel import optim
        from deep_active_semantic_segmentation_tpu.parallel.steps import (
            init_train_state, make_train_step)

        state = init_train_state(model, jax.random.PRNGKey(0),
                                 (1, side, side, 3))
        step = make_train_step(
            model, schedule=constant_schedule(0.01),
            lr_mults=lr_multiplier_tree(state.params, "deeplab"),
            optimizer="SGD", opt_cfg=optim.SGDConfig(0.9, 5e-4, False),
            compute_dtype=jnp.bfloat16)
        tb = {"image": images, "label": labels}
        state, m = step(state, tb, jax.random.PRNGKey(1))
        _force(m["loss"])
        start = time.perf_counter()
        for i in range(iters):
            state, m = step(state, tb, jax.random.PRNGKey(i))
        _force(m["loss"])
        train_imgs_per_sec = batch * iters / (time.perf_counter() - start)
    except Exception:
        pass

    # --- eval step throughput (incl. device confusion matrix) --------------
    eval_imgs_per_sec = None
    try:
        from deep_active_semantic_segmentation_tpu.parallel.steps import (
            make_eval_step)

        ev = make_eval_step(model, num_classes)
        out = ev(state, tb, jnp.float32(batch))
        _force(out["loss"])
        start = time.perf_counter()
        for _ in range(iters):
            out = ev(state, tb, jnp.float32(batch))
        _force(out["loss"])
        eval_imgs_per_sec = batch * iters / (time.perf_counter() - start)
    except Exception:
        pass

    print(json.dumps({
        "metric": "mc_dropout_pool_scoring",
        "value": round(kernel_imgs_per_sec, 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(kernel_imgs_per_sec / REF_IMGS_PER_SEC, 3),
        "extra": {
            "e2e_pool_scoring_imgs_per_sec": round(e2e_imgs_per_sec, 3),
            "e2e_vs_baseline": round(e2e_imgs_per_sec / REF_IMGS_PER_SEC, 3),
            "host_geometry_ceiling_imgs_per_sec": round(host_ceiling, 3),
            "relay_transfer_ceiling_imgs_per_sec": round(relay_ceiling, 3),
            "kernel_flops_per_img": flops_per_img,
            "kernel_mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
            "train_imgs_per_sec_bf16": (round(train_imgs_per_sec, 3)
                                        if train_imgs_per_sec else None),
            "eval_imgs_per_sec": (round(eval_imgs_per_sec, 3)
                                  if eval_imgs_per_sec else None),
            "e2e_pool_images": len(paths),
        },
    }))


if __name__ == "__main__":
    main()
