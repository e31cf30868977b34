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
  the e2e number is transfer-bound (random-payload wire, 40-52 ms/img;
  host geometry is ~9 ms/img via the round-4 crop-windowed native
  resize, down from ~17); the per-stage breakdown ships in extra.

Also reported: MFU for the kernel (XLA cost_analysis flops vs the v5e
bf16 peak) and the bf16 train-step throughput.

Baseline: the reference publishes no numbers; REF_IMGS_PER_SEC=1.5 is the
documented structural estimate (BASELINE.md — ~30 fps single-GPU DeepLab
inference / 20 MC steps, ignoring its per-image python entropy loop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import subprocess
import sys
import time

# persistent compile cache: the driver invokes bench.py with a bare env,
# and every first-compile goes through the remote-compile relay (1-3 min
# per program) — cache them across runs/rounds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REF_IMGS_PER_SEC = 1.5   # documented estimate, see BASELINE.md
V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip

E2E_IMAGES = 48
E2E_STORE = "/tmp/dass_bench_store"

# Hot-loop families shipped in the artifact's extra (VERDICT r3 #1: the
# per-family claims must ride in the driver-captured artifact). Keys into
# tools/bench_hotloops.BENCHES; tests/test_experiment_scripts.py asserts
# the mapping stays valid.
HOTLOOP_BENCHES = ("enetmc", "enettrain", "resnet", "unet", "dualhead",
                   "region")

# Backend-availability probe (round-3 lesson: BENCH_r03 died with rc=1 at
# the first device touch — "Unable to initialize backend 'axon':
# UNAVAILABLE" — a transient chip outage that cost the whole round's perf
# artifact).  jax caches a failed backend for the life of the process, and
# a hung init can block forever, so the probe runs in a SUBPROCESS with a
# timeout and bounded retries; only once it succeeds do we import jax here.
PROBE_ATTEMPTS = 5
PROBE_TIMEOUT_S = 240
PROBE_BACKOFF_S = 90


def _wait_for_backend():
    """Bounded retry loop around a subprocess `jax.devices()` probe.

    Returns None on success; on final failure returns a dict describing
    the error (emitted as the structured JSON result instead of a raw
    traceback).
    """
    errors = []
    for attempt in range(PROBE_ATTEMPTS):
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print(len(d), d[0].platform)"],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S)
            if proc.returncode == 0:
                return None
            errors.append(proc.stderr.strip().splitlines()[-1]
                          if proc.stderr.strip() else f"rc={proc.returncode}")
        except subprocess.TimeoutExpired:
            errors.append(f"probe timed out after {PROBE_TIMEOUT_S}s")
        print(f"[bench] backend probe attempt {attempt + 1}/{PROBE_ATTEMPTS} "
              f"failed: {errors[-1]}", file=sys.stderr)
        if attempt < PROBE_ATTEMPTS - 1:
            time.sleep(PROBE_BACKOFF_S)
    return {"error": "backend unavailable after "
                     f"{PROBE_ATTEMPTS} probe attempts",
            "probe_errors": errors}


def _emit_failure(payload):
    """One parseable JSON line even when the chip is down (value=null so a
    recorded artifact can never be mistaken for a measurement)."""
    print(json.dumps({
        "metric": "mc_dropout_pool_scoring",
        "value": None,
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "extra": payload,
    }))


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


def _e2e_stage_breakdown(store, paths, side, batch, num_classes,
                         model, variables):
    """Serial per-stage costs (ms/img) of the e2e pool-scoring pipeline:
    store read -> host geometry -> wire pack -> host->device transfer ->
    MC kernel -> rank fetch. The prefetch pipeline overlaps these, so the
    pipelined expectation is max(stage) and the gap to measured e2e is
    bubble overhead — the attribution round-2/3 artifacts lacked."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep_active_semantic_segmentation_tpu import constants
    from deep_active_semantic_segmentation_tpu.data.loader import PathsLoader
    from deep_active_semantic_segmentation_tpu.selection import (
        base as sel_base, kernels)

    loader = PathsLoader(store, paths, side, batch, include_labels=True,
                         device_normalize=True, labels_as_mask=num_classes)
    sub = paths[:min(len(paths), 2 * batch)]
    n = len(sub)
    out = {}

    for p in sub:                       # warm the FS cache
        np.asarray(store.get(p))
    t0 = time.perf_counter()
    recs = [np.asarray(store.get(p)) for p in sub]
    out["store_read"] = (time.perf_counter() - t0) * 1000 / n

    t0 = time.perf_counter()
    for r in recs:
        loader._scalecrop({"image": r[:, :, 0:3], "label": r[:, :, 3]})
    out["host_geometry"] = (time.perf_counter() - t0) * 1000 / n

    # pack = full host build minus the two stages above (stack, dtype
    # casts, packbits of the valid mask)
    chunks = [sub[i: i + batch] for i in range(0, n, batch)]
    t0 = time.perf_counter()
    batches = [loader.build_batch(c) for c in chunks]
    build_ms = (time.perf_counter() - t0) * 1000 / n
    out["wire_pack"] = max(
        build_ms - out["store_read"] - out["host_geometry"], 0.0)

    wire = batches[0]
    dev = {k: jax.device_put(wire[k]) for k in ("image", "label")}
    _force(dev["image"])
    t0 = time.perf_counter()
    for b in batches:
        d = {k: jax.device_put(b[k]) for k in ("image", "label")}
    _force(d["image"])
    _force(d["label"])
    out["transfer"] = (time.perf_counter() - t0) * 1000 / n

    dtype = sel_base.mc_scoring_dtype()

    def kernel(img, lab, key):
        maps = kernels.mc_vote_entropy_maps(
            model, variables, img, lab, key, num_classes,
            constants.MC_STEPS, "dropout", fused_upsample=True,
            compute_dtype=dtype, labels_packed=True)
        return jnp.mean(maps, axis=(1, 2))

    scores = kernel(dev["image"], dev["label"], jax.random.PRNGKey(0))
    _force(scores)                       # compile + warm
    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        scores = kernel(dev["image"], dev["label"], jax.random.PRNGKey(i))
    _force(scores)
    out["mc_kernel"] = (time.perf_counter() - t0) * 1000 / (iters * batch)

    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(kernel(dev["image"], dev["label"], jax.random.PRNGKey(9)))
    sync_ms = (time.perf_counter() - t0) * 1000 / (iters * batch)
    out["rank_fetch"] = max(sync_ms - out["mc_kernel"], 0.0)

    out = {k: round(v, 3) for k, v in out.items()}
    bottleneck = max(out, key=out.get)
    out["pipelined_expectation_imgs_per_sec"] = round(
        1000.0 / out[bottleneck], 3)
    out["bottleneck_stage"] = bottleneck
    return out


AL_ROUND_STORE = "/tmp/dass_bench_al"
AL_TRAIN, AL_VAL, AL_SEED, AL_BATCH = 192, 16, 48, 24
AL_CROP, AL_REC_H, AL_REC_W, AL_STEP_BATCH = 513, 1024, 2048, 8
AL_REGION, AL_REGION_IMAGES = 129, 96


def _al_round_phase_clock():
    """Composite AL-round wall clock at canonical GEOMETRY (513 crop,
    batch 8, DeepLab/MobileNetV2, MC_STEPS=20 variance scoring) on a
    full-res synthetic store, by instrumenting the REAL run_active_loop
    (engine/active_loop.py; reference outer loop active_train.py:376-527).

    Reports the phases of round 1 — the first fully WARM round (round 0
    carries every compile) — plus round 0's for the compile overhead.
    Pool is 192 full-res images / 48 seed (not the canonical 2,975/50:
    the phase rates below are per-image linear, and a 25 GB store build
    would dominate the bench's runtime; sizes are reported so nothing
    extrapolates silently). Also times one region-mode scoring+NMS pass
    (mc_dropout.py:123-171) with the round-1 bundle."""
    import numpy as np

    from deep_active_semantic_segmentation_tpu.config import ExperimentConfig
    from deep_active_semantic_segmentation_tpu.data.store import DirectoryStore
    from deep_active_semantic_segmentation_tpu.data.convert import emit_seed_set
    from deep_active_semantic_segmentation_tpu.engine import active_loop as al
    from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer
    from deep_active_semantic_segmentation_tpu.selection.mc_dropout import (
        ActiveSelectionMCDropout)

    root = os.path.join(AL_ROUND_STORE, "datasets")
    marker = os.path.join(AL_ROUND_STORE,
                          f".ready_{AL_TRAIN}_{AL_VAL}_{AL_REC_H}")
    if not os.path.exists(marker):
        rng = np.random.RandomState(7)
        for split, n in (("train", AL_TRAIN), ("val", AL_VAL)):
            store = DirectoryStore(os.path.join(root, "cityscapes", split),
                                   readonly=False)
            keys = []
            for i in range(n):
                img = rng.randint(0, 255, size=(AL_REC_H, AL_REC_W, 3),
                                  dtype=np.uint8)
                lab = rng.randint(0, 19, size=(AL_REC_H, AL_REC_W)
                                  ).astype(np.uint8)
                k = f"/leftImg8bit/{split}/c/img_{i:04d}.png".encode()
                store.put(k, np.dstack((img, lab)))
                keys.append(k)
            store.finalize(keys)
            if split == "train":
                emit_seed_set(keys, os.path.join(root, "cityscapes", "train"),
                              count=AL_SEED, seed=0)
        open(marker, "w").close()

    # per-round phase accumulators, bucketed by which round is active
    rounds = []

    def timed(obj, name, phase):
        orig = getattr(obj, name)

        def wrapper(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            if rounds:
                rounds[-1][phase] = rounds[-1].get(phase, 0.0) \
                    + time.perf_counter() - t0
            return out
        setattr(obj, name, wrapper)
        return orig

    saved = {}
    saved["training"] = timed(Trainer, "training", "train_s")
    saved["validation"] = timed(Trainer, "validation", "val_s")
    saved["load_best_checkpoint"] = timed(Trainer, "load_best_checkpoint",
                                          "ckpt_reload_s")
    saved["score"] = timed(ActiveSelectionMCDropout,
                           "get_vote_entropy_for_images", "pool_sweep_s")
    orig_init = Trainer.initialize

    def init_spy(self):
        rounds.append({"t0": time.perf_counter()})
        if len(rounds) > 1:
            rounds[-2]["total_s"] = rounds[-1]["t0"] - rounds[-2]["t0"]
        t0 = time.perf_counter()
        orig_init(self)
        rounds[-1]["init_s"] = time.perf_counter() - t0

    Trainer.initialize = init_spy
    cfg = ExperimentConfig(
        architecture="deeplab", backbone="mobilenet", out_stride=16,
        dataset="active_cityscapes_image", base_size=AL_CROP,
        crop_size=AL_CROP,
        epochs=2, batch_size=AL_STEP_BATCH, test_batch_size=AL_STEP_BATCH,
        lr=0.01,
        use_lr_scheduler=True, eval_interval=2, seed=1,
        active_selection_mode="variance",
        active_batch_size=AL_BATCH, max_iterations=3,
        checkname="bench-al-round", no_early_stop=True,
        workers=0).finalize(n_devices=1)
    try:
        t_all = time.perf_counter()
        al.run_active_loop(cfg, mesh=None, dataset_root=root,
                           runs_root=f"/tmp/dass_bench_al/runs_{os.getpid()}")
        total_loop = time.perf_counter() - t_all
    finally:
        for name, fn in saved.items():
            setattr(Trainer if name != "score" else ActiveSelectionMCDropout,
                    {"score": "get_vote_entropy_for_images"}.get(name, name),
                    fn)
        Trainer.initialize = orig_init

    # rounds[0] = the pre-loop initialize; rounds[1..] = AL rounds 0..
    def phases(r):
        return {k: round(v, 2) for k, v in r.items()
                if k.endswith("_s")}

    out = {
        "geometry": {"crop": AL_CROP, "batch": AL_STEP_BATCH,
                     "pool_images": AL_TRAIN,
                     "seed_images": AL_SEED, "epochs_per_round": 2,
                     "active_batch": AL_BATCH,
                     "note": "canonical geometry, scaled pool; "
                             "phase rates are per-image linear"},
        "round0_cold": phases(rounds[1]) if len(rounds) > 1 else None,
        "round1_warm": phases(rounds[2]) if len(rounds) > 2 else None,
        "loop_total_s": round(total_loop, 2),
    }

    # region-mode scoring + device NMS with a fresh bundle on the same pool
    try:
        import jax
        import jax.numpy as jnp

        from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
        from deep_active_semantic_segmentation_tpu.selection.base import (
            ModelBundle)

        store = DirectoryStore(os.path.join(root, "cityscapes", "train"))
        paths = store.keys()[:AL_REGION_IMAGES]
        model = DeepLab(num_classes=19, backbone="mobilenet", output_stride=16)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, AL_CROP, AL_CROP, 3),
                                         jnp.float32),
                               train=False)
        bundle = ModelBundle(model, variables["params"],
                             variables.get("batch_stats", {}))
        sel = ActiveSelectionMCDropout(19, store, AL_CROP, AL_STEP_BATCH)
        sel.create_region_maps(bundle, paths[:AL_STEP_BATCH],
                               [[] for _ in range(AL_STEP_BATCH)],
                               AL_REGION, 1, seed=5)    # warm/compile
        t0 = time.perf_counter()
        _, count = sel.create_region_maps(
            bundle, paths, [[] for _ in paths], AL_REGION, 8, seed=6)
        out["region_round"] = {
            "images": len(paths), "boxes": int(count),
            "score_plus_nms_s": round(time.perf_counter() - t0, 2),
            "imgs_per_sec": round(len(paths)
                                  / (time.perf_counter() - t0), 2)}
    except Exception as exc:  # noqa: BLE001
        out["region_round"] = {"error": f"{type(exc).__name__}: {exc}"}
    return out


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

    # --- per-stage e2e attribution ------------------------------------------
    # The pipeline overlaps stages (prefetch workers), so e2e should sit at
    # ~1/max(stage cost) of the serial stage costs below; the gap between
    # that pipelined expectation and measured e2e is bubble overhead
    # (attribution for the residual the round-2/3 artifacts left unnamed).
    stage_ms = _e2e_stage_breakdown(store, paths, side, batch, num_classes,
                                    model, variables)

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
    # (PathsLoader labels_as_mask): 3.125 bytes/pixel.
    # MUST be incompressible payloads: the relay compresses the wire, and
    # an all-zeros probe measured 74-84 imgs/s where real image bytes move
    # at ~19 (the inflated ceiling is exactly the round-2/3 'unexplained
    # e2e residual' — e2e was being compared against a fake-fast bound).
    _wr = np.random.RandomState(5)
    wire_img = _wr.randint(0, 256, (batch, side, side, 3)).astype(np.uint8)
    wire_mask = _wr.randint(0, 256, (batch, side, (side + 7) // 8)
                            ).astype(np.uint8)
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

    # --- train step MFU (the #2 hot loop: 200 epochs per AL round) ---------
    train_mfu = train_flops_per_img = None
    try:
        cost = step.lower(state, tb,
                          jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
        if fl > 0 and train_imgs_per_sec:
            train_flops_per_img = fl / batch
            train_mfu = (train_imgs_per_sec * train_flops_per_img
                         / V5E_PEAK_FLOPS)
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

    # --- composite AL-round wall clock (canonical geometry) -----------------
    try:
        al_round = _al_round_phase_clock()
    except Exception as exc:  # noqa: BLE001 — keep the headline artifact
        import traceback

        traceback.print_exc(file=sys.stderr)
        al_round = {"error": f"{type(exc).__name__}: {exc}"}

    # --- hot-loop family throughputs (tools/bench_hotloops) ----------------
    # VERDICT r3 #1: the round-3/4 per-family claims (ENet MC scoring,
    # ENet/ResNet101/UNet/dual-head train) must ride in the driver-captured
    # artifact, not only in builder-run tool output. Each is independent;
    # a failure records its error string instead of killing the headline.
    hot_loops = {}
    if not os.environ.get("DASS_BENCH_SKIP_HOTLOOPS"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools import bench_hotloops as hl

        for name in HOTLOOP_BENCHES:
            try:
                r = hl.BENCHES[name]()
                hot_loops[r["metric"]] = {"value": r["value"],
                                          "unit": r["unit"]}
            except Exception as exc:  # noqa: BLE001
                hot_loops[name] = {"error": f"{type(exc).__name__}: {exc}"}

    print(json.dumps({
        "metric": "mc_dropout_pool_scoring",
        "value": round(kernel_imgs_per_sec, 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(kernel_imgs_per_sec / REF_IMGS_PER_SEC, 3),
        "extra": {
            "e2e_pool_scoring_imgs_per_sec": round(e2e_imgs_per_sec, 3),
            "e2e_vs_baseline": round(e2e_imgs_per_sec / REF_IMGS_PER_SEC, 3),
            "e2e_stage_ms_per_img": stage_ms,
            "e2e_pipeline_bubble_fraction": round(
                max(1.0 - e2e_imgs_per_sec
                    / stage_ms["pipelined_expectation_imgs_per_sec"], 0.0), 3),
            "host_geometry_ceiling_imgs_per_sec": round(host_ceiling, 3),
            "relay_transfer_ceiling_imgs_per_sec": round(relay_ceiling, 3),
            "kernel_flops_per_img": flops_per_img,
            "kernel_mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
            "train_imgs_per_sec_bf16": (round(train_imgs_per_sec, 3)
                                        if train_imgs_per_sec else None),
            "train_flops_per_img": train_flops_per_img,
            "train_mfu_vs_bf16_peak": (round(train_mfu, 4)
                                       if train_mfu else None),
            "eval_imgs_per_sec": (round(eval_imgs_per_sec, 3)
                                  if eval_imgs_per_sec else None),
            "e2e_pool_images": len(paths),
            "al_round_phase_clock": al_round,
            "hot_loops": hot_loops,
        },
    }))


if __name__ == "__main__":
    failure = _wait_for_backend()
    if failure is not None:
        _emit_failure(failure)
        sys.exit(0)
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — structured artifact over rc=1
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_failure({"error": f"{type(exc).__name__}: {exc}"})
        sys.exit(0)
