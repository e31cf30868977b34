"""Benchmarks for the non-headline hot loops (SURVEY.md section 3.1).

Round-2 verdict missing #3: TPU numbers existed only for MC pool scoring
and the train step. This tool measures, on the real chip:

  1. region-mode create_region_maps at canonical geometry (513 crop,
     129 region) — device box-sum + device while_loop NMS; the selection
     round's wire is the box list only;
  2. core-set k-center greedy at a realistic pool size (~3,000 images,
     FEATURE_DIM=2736);
  3. max-subset greedy at the same scale;
  4. CEAL single-forward scoring at `high` matmul precision (the
     fidelity-default for deterministic scorers);
  5. DeepLab-ResNet101 train step (BASELINE config #4's model);
  6. ENet MC vote-entropy kernel (the round-3 fused tconv+argmax path).

Usage: python tools/bench_hotloops.py [which ...]   (default: all)
Prints one JSON line per bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(x):
    import numpy as np

    return np.asarray(x)


def _median3(fn):
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return sorted(vals)[1]


V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip (matches bench.py)


def _step_mfu(jitted, args, imgs_per_sec, batch):
    """flops/img (XLA cost_analysis of the compiled step) and MFU vs the
    v5e bf16 peak. Returns (flops_per_img, mfu) or (None, None) — never
    raises, so every train bench can ship the pair in extra."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
        if fl <= 0:
            return None, None
        per_img = fl / batch
        return round(per_img / 1e9, 3), round(
            imgs_per_sec * per_img / V5E_PEAK_FLOPS, 4)
    except Exception:
        return None, None


def bench_region_pipeline():
    """create_region_maps at canonical geometry over a synthetic device
    pool: per-batch MC entropy maps -> box-sum -> device NMS."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu import constants
    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.selection import kernels
    from deep_active_semantic_segmentation_tpu.selection.region_pipeline import (
        create_region_maps_from_scorer)
    from deep_active_semantic_segmentation_tpu.selection import base as sel_base

    side, region, batch, n_imgs = 513, 129, 8, 200
    ncls = 19
    model = DeepLab(num_classes=ncls, backbone="mobilenet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, side, side, 3), jnp.float32),
                           train=False)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (batch, side, side, 3), jnp.float32)
    labels = jnp.zeros((batch, side, side), jnp.float32)

    def scorer(batch_dict):
        return kernels.mc_vote_entropy_maps(
            model, variables, batch_dict["image"], batch_dict["label"],
            batch_dict["key"], ncls, constants.MC_STEPS, "dropout",
            fused_upsample=True, compute_dtype=sel_base.mc_scoring_dtype())

    def fake_loader():
        for i in range(n_imgs // batch):
            yield {"image": imgs, "label": labels, "nvalid": batch,
                   "key": jax.random.PRNGKey(i)}

    paths = [f"/img_{i}".encode() for i in range(n_imgs)]
    existing = [[] for _ in range(n_imgs)]

    # warmup at FULL geometry: the normalize and NMS programs key on the
    # (N, S, S) pool shape and the bucketed box count, so a small warmup
    # leaves their compiles (or compile-cache loads) inside the timed
    # pass. One full pass warms everything; the timed pass is then the
    # per-AL-round marginal cost (one compile per run, reused across
    # rounds — selection/base.py).
    create_region_maps_from_scorer(scorer, fake_loader(), paths, existing,
                                   region, 125, side)
    t0 = time.perf_counter()
    regions, count = create_region_maps_from_scorer(
        scorer, fake_loader(), paths, existing, region, 125, side)
    dt = time.perf_counter() - t0
    return {"metric": "region_create_region_maps",
            "value": round(n_imgs / dt, 3), "unit": "imgs/sec/chip",
            "extra": {"images": n_imgs, "boxes_selected": int(count),
                      "seconds": round(dt, 2), "region": region,
                      "crop": side,
                      "wire": "box list only (device NMS)"}}


def bench_kcenter(n_pool=3000, dim=2736, k=125):
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.ops.distance import (
        kcenter_greedy)

    feats = jax.random.normal(jax.random.PRNGKey(0), (n_pool, dim),
                              jnp.float32)
    seed = jnp.zeros((n_pool,), bool).at[:50].set(True)
    _force(kcenter_greedy(feats, seed, k))
    dt = _median3(lambda: _force(kcenter_greedy(feats, seed, k)))
    return {"metric": "kcenter_greedy", "value": round(dt, 3),
            "unit": "sec/round",
            "extra": {"pool": n_pool, "dim": dim, "k": k}}


def bench_max_subset(n_pool=3000, dim=2736, n_cand=250, k=125):
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.ops.distance import (
        max_representative)

    pool = jax.random.normal(jax.random.PRNGKey(0), (n_pool, dim), jnp.float32)
    cand = jax.random.normal(jax.random.PRNGKey(1), (n_cand, dim), jnp.float32)
    _force(max_representative(pool, cand, k))
    dt = _median3(lambda: _force(max_representative(pool, cand, k)))
    return {"metric": "max_subset_greedy", "value": round(dt, 3),
            "unit": "sec/round",
            "extra": {"pool": n_pool, "dim": dim, "candidates": n_cand,
                      "k": k}}


def bench_ceal_high(batch=8, side=513):
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.selection import kernels
    from deep_active_semantic_segmentation_tpu.selection.base import (
        scoring_precision)

    ncls = 19
    model = DeepLab(num_classes=ncls, backbone="mobilenet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, side, side, 3), jnp.float32),
                           train=False)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (batch, side, side, 3), jnp.float32)
    labels = jnp.zeros((batch, side, side), jnp.float32)
    out = {}
    for prec in ("default", "high"):
        with scoring_precision(prec):
            _force(kernels.softmax_score_per_image(
                model, variables, imgs, labels, ncls, "entropy"))
            iters = 8

            def run():
                for _ in range(iters):
                    o = kernels.softmax_score_per_image(
                        model, variables, imgs, labels, ncls, "entropy")
                _force(o)

            dt = _median3(run)
        out[prec] = round(batch * iters / dt, 3)
    return {"metric": "ceal_entropy_scoring", "value": out["high"],
            "unit": "imgs/sec/chip",
            "extra": {"precision_high": out["high"],
                      "precision_default": out["default"],
                      "crop": side}}


def bench_resnet_train(batch=8, side=513, backbone="resnet101"):
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models import (
        build_model, lr_multiplier_tree)
    from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
        constant_schedule)
    from deep_active_semantic_segmentation_tpu.parallel import optim
    from deep_active_semantic_segmentation_tpu.parallel.steps import (
        init_train_state, make_train_step)

    model = build_model("deeplab", num_classes=19, backbone=backbone,
                        output_stride=16)
    state = init_train_state(model, jax.random.PRNGKey(0), (1, side, side, 3))
    step = make_train_step(
        model, schedule=constant_schedule(0.01),
        lr_mults=lr_multiplier_tree(state.params, "deeplab"),
        optimizer="SGD", opt_cfg=optim.SGDConfig(0.9, 5e-4, False),
        compute_dtype=jnp.bfloat16)
    b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                    (batch, side, side, 3), jnp.float32),
         "label": jnp.zeros((batch, side, side), jnp.float32)}
    state, m = step(state, b, jax.random.PRNGKey(1))
    _force(m["loss"])
    iters = 6

    def run():
        nonlocal state
        for i in range(iters):
            state, m = step(state, b, jax.random.PRNGKey(i))
        _force(m["loss"])

    dt = _median3(run)
    rate = batch * iters / dt
    gflops, mfu = _step_mfu(step, (state, b, jax.random.PRNGKey(0)),
                            rate, batch)
    return {"metric": f"deeplab_{backbone}_train_step",
            "value": round(rate, 3), "unit": "imgs/sec/chip",
            "extra": {"crop": side, "batch": batch, "dtype": "bfloat16",
                      "gflops_per_img": gflops,
                      "mfu_vs_bf16_peak": mfu}}


def bench_enet_train(batch=8, side=512):
    """ENet train step (512^2, Adam, bf16) — the geometry of BASELINE's
    scatter-excision row (387.1 -> 69.0 ms in round 2); re-benched here so
    pool/unpool changes (e.g. the round-4 tournament first-max) carry a
    train-path number alongside the MC-scoring one."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models import (
        build_model, lr_multiplier_tree)
    from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
        constant_schedule)
    from deep_active_semantic_segmentation_tpu.parallel import optim
    from deep_active_semantic_segmentation_tpu.parallel.steps import (
        init_train_state, make_train_step)

    model = build_model("enet", num_classes=19)
    state = init_train_state(model, jax.random.PRNGKey(0),
                             (1, side, side, 3), optimizer="Adam")
    step = make_train_step(
        model, schedule=constant_schedule(5e-4),
        lr_mults=lr_multiplier_tree(state.params, "enet"),
        optimizer="Adam", opt_cfg=optim.AdamConfig(),
        compute_dtype=jnp.bfloat16)
    b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                    (batch, side, side, 3), jnp.float32),
         "label": jnp.zeros((batch, side, side), jnp.float32)}
    state, m = step(state, b, jax.random.PRNGKey(1))
    _force(m["loss"])
    iters = 10

    def run():
        nonlocal state
        for i in range(iters):
            state, m = step(state, b, jax.random.PRNGKey(i))
        _force(m["loss"])

    dt = _median3(run)
    rate = batch * iters / dt
    gflops, mfu = _step_mfu(step, (state, b, jax.random.PRNGKey(0)),
                            rate, batch)
    return {"metric": "enet_train_step",
            "value": round(rate, 3), "unit": "imgs/sec/chip",
            "extra": {"crop": side, "batch": batch, "dtype": "bfloat16",
                      "optimizer": "Adam", "gflops_per_img": gflops,
                      "mfu_vs_bf16_peak": mfu}}


def bench_enet_mc(batch=8, side=512, mc=20):
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models.enet import ENet
    from deep_active_semantic_segmentation_tpu.selection import kernels

    ncls = 19
    model = ENet(num_classes=ncls)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, side, side, 3), jnp.float32),
                           train=False)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (batch, side, side, 3), jnp.float32)
    labels = jnp.zeros((batch, side, side), jnp.float32)

    def score(key):
        # reduce to per-image scores ON DEVICE (like the selector and the
        # headline bench): forcing the full (B, 512, 512) maps to the host
        # makes the measurement transfer-bound on the relay link
        maps = kernels.mc_vote_entropy_maps(
            model, variables, imgs, labels, key, ncls, mc, "dropout",
            fused_upsample=True, compute_dtype="bfloat16")
        return jnp.mean(maps, axis=(1, 2))

    _force(score(jax.random.PRNGKey(2)))
    iters = 4

    def run():
        for i in range(iters):
            o = score(jax.random.PRNGKey(10 + i))
        _force(o)

    dt = _median3(run)
    return {"metric": "enet_mc_scoring", "value": round(batch * iters / dt, 3),
            "unit": "imgs/sec/chip",
            "extra": {"crop": side, "mc_steps": mc, "dtype": "bfloat16",
                      "fused": "parity tconv+argmax"}}


def bench_unet_train(batch=8, side=512):
    """UNet train step, space-to-depth packed full-res stages vs plain
    (round-3: models/unet.py use_s2d)."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models import lr_multiplier_tree
    from deep_active_semantic_segmentation_tpu.models.unet import UNet
    from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
        constant_schedule)
    from deep_active_semantic_segmentation_tpu.parallel import optim
    from deep_active_semantic_segmentation_tpu.parallel.steps import (
        init_train_state, make_train_step)

    out = {}
    b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                    (batch, side, side, 3), jnp.float32),
         "label": jnp.zeros((batch, side, side), jnp.float32)}
    for use_s2d in (True, False):
        model = UNet(in_channels=3, num_classes=19, use_s2d=use_s2d)
        state = init_train_state(model, jax.random.PRNGKey(0),
                                 (1, side, side, 3))
        step = make_train_step(
            model, schedule=constant_schedule(0.01),
            lr_mults=lr_multiplier_tree(state.params, "unet"),
            optimizer="SGD", opt_cfg=optim.SGDConfig(0.9, 5e-4, False),
            compute_dtype=jnp.bfloat16)
        state, m = step(state, b, jax.random.PRNGKey(1))
        _force(m["loss"])
        iters = 8

        def run():
            nonlocal state
            for i in range(iters):
                state, m = step(state, b, jax.random.PRNGKey(i))
            _force(m["loss"])

        dt = _median3(run)
        out["s2d" if use_s2d else "plain"] = round(batch * iters / dt, 3)
        if use_s2d:
            gflops, mfu = _step_mfu(step, (state, b, jax.random.PRNGKey(0)),
                                    out["s2d"], batch)
    return {"metric": "unet_train_step", "value": out["s2d"],
            "unit": "imgs/sec/chip",
            "extra": {"crop": side, "batch": batch, "dtype": "bfloat16",
                      "plain_imgs_per_sec": out["plain"],
                      "s2d_speedup": round(out["s2d"] / out["plain"], 3),
                      "gflops_per_img": gflops,
                      "mfu_vs_bf16_peak": mfu}}


def bench_dualhead_train(batch=8, side=513):
    """Dual-head (DeepLab + UNet error head) train step at the canonical
    513^2 geometry, packed error head (odd-canvas s2d) vs plain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep_active_semantic_segmentation_tpu.models import lr_multiplier_tree
    from deep_active_semantic_segmentation_tpu.models.accuracy_predictor import (
        DeepLabAccuracyPredictor)
    from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
        constant_schedule)
    from deep_active_semantic_segmentation_tpu.parallel import optim
    from deep_active_semantic_segmentation_tpu.parallel.steps import (
        init_train_state, make_dual_train_step)

    out = {}
    b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                    (batch, side, side, 3), jnp.float32),
         "label": jnp.asarray(
             np.random.RandomState(0)
             .randint(0, 19, size=(batch, side, side)).astype(np.float32))}
    for use_s2d in (True, False):
        model = DeepLabAccuracyPredictor(num_classes=19, backbone="mobilenet",
                                         output_stride=16, use_s2d=use_s2d)
        state = init_train_state(model, jax.random.PRNGKey(0),
                                 (1, side, side, 3))
        step = make_dual_train_step(
            model, schedule=constant_schedule(0.01),
            lr_mults=lr_multiplier_tree(state.params, "accuracy_predictor"),
            optimizer="SGD", opt_cfg=optim.SGDConfig(0.9, 5e-4, False),
            compute_dtype=jnp.bfloat16)
        extra = (jnp.float32(1.0), jnp.float32(0.3))
        state, m = step(state, b, jax.random.PRNGKey(1), *extra)
        _force(m["loss"])
        iters = 8

        def run():
            nonlocal state
            for i in range(iters):
                state, m = step(state, b, jax.random.PRNGKey(i), *extra)
            _force(m["loss"])

        dt = _median3(run)
        out["s2d" if use_s2d else "plain"] = round(batch * iters / dt, 3)
        if use_s2d:
            gflops, mfu = _step_mfu(
                step, (state, b, jax.random.PRNGKey(0)) + extra,
                out["s2d"], batch)
    return {"metric": "dualhead_train_step", "value": out["s2d"],
            "unit": "imgs/sec/chip",
            "extra": {"crop": side, "batch": batch, "dtype": "bfloat16",
                      "plain_imgs_per_sec": out["plain"],
                      "s2d_speedup": round(out["s2d"] / out["plain"], 3),
                      "gflops_per_img": gflops,
                      "mfu_vs_bf16_peak": mfu}}


BENCHES = {
    "region": bench_region_pipeline,
    "kcenter": bench_kcenter,
    "maxsubset": bench_max_subset,
    "ceal": bench_ceal_high,
    "resnet": bench_resnet_train,
    "enetmc": bench_enet_mc,
    "enettrain": bench_enet_train,
    "unet": bench_unet_train,
    "dualhead": bench_dualhead_train,
}


def main():
    which = sys.argv[1:] or list(BENCHES)
    for name in which:
        out = BENCHES[name]()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
