"""Per-HLO device-time profiler for train/eval steps.

This is the tool that found the round-2 perf whales (BASELINE.md): the
CE loss `take_along_axis` gather (37.8 ms of a 67.5 ms DeepLab step),
the confusion-matrix `bincount` scatter-add, and ENet's sort-based
unpool scatters. It traces a few steps with ``jax.profiler``, then
parses the xplane proto directly (the tensorboard-plugin-profile
converter in this image is API-incompatible with its tensorflow) and
prints per-op device self-times, worst first.

Usage:
    python tools/trace_step.py deeplab|enet|fastscnn|unet|dual [side] [batch]

Run the TRACE phase on the TPU host; the PARSE phase is pure CPU (it
re-execs itself with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python to
dodge the image's C-protobuf/descriptor mismatch).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

# the script lives in tools/ — put the repo root on sys.path (setting
# PYTHONPATH instead would shadow the host's sitecustomize TPU plugin)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache — every first compile goes through the remote
# relay (1-3 min per program); without this a single trace of a big step
# (e.g. the dual-head train step) can blow a 10-min budget on compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

LOG = "/tmp/dass_trace_step"


def trace(model_name: str, side: int, batch: int, steps: int = 3) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep_active_semantic_segmentation_tpu.models import build_model
    from deep_active_semantic_segmentation_tpu.models import (
        lr_multiplier_tree)
    from deep_active_semantic_segmentation_tpu.models.accuracy_predictor import (
        DeepLabAccuracyPredictor)
    from deep_active_semantic_segmentation_tpu.ops.lr_schedule import (
        constant_schedule)
    from deep_active_semantic_segmentation_tpu.parallel import optim
    from deep_active_semantic_segmentation_tpu.parallel.steps import (
        init_train_state, make_dual_train_step, make_train_step)

    if model_name == "enet_mc":
        # the MC vote-entropy SCORING step (selection hot loop), not a
        # train step: ENet's dropout sites span the encoder so no backbone
        # hoist applies and all 20 stochastic decodes run full-res
        # (BASELINE.md round-3: 27.7 imgs/s, 4x DeepLab's rate; this trace
        # is the evidence VERDICT r3 asked for on where the ~23 ms/img go)
        from deep_active_semantic_segmentation_tpu import constants
        from deep_active_semantic_segmentation_tpu.selection import (
            kernels as sel_kernels)

        model = build_model("enet", num_classes=19, mc_dropout=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, side, side, 3), jnp.float32), train=False)
        images = jax.random.normal(jax.random.PRNGKey(1),
                                   (batch, side, side, 3), jnp.float32)
        labels = jnp.zeros((batch, side, side), jnp.float32)

        def score(key):
            maps = sel_kernels.mc_vote_entropy_maps(
                model, variables, images, labels, key, 19,
                constants.MC_STEPS, "dropout", fused_upsample=True,
                compute_dtype=jnp.bfloat16)
            return jnp.mean(maps, axis=(1, 2))

        np.asarray(score(jax.random.PRNGKey(2)))
        shutil.rmtree(LOG, ignore_errors=True)
        with jax.profiler.trace(LOG):
            for i in range(steps):
                out = score(jax.random.PRNGKey(10 + i))
            np.asarray(out)
        print(f"traced {steps} enet MC-scoring steps {side}^2 bs{batch}",
              flush=True)
        return

    dual = model_name == "dual"
    if dual:
        model = DeepLabAccuracyPredictor(num_classes=19, backbone="mobilenet",
                                         output_stride=16)
    else:
        model = build_model(model_name, num_classes=19, backbone="mobilenet",
                            output_stride=16)
    st = init_train_state(model, jax.random.PRNGKey(0), (1, side, side, 3))
    mults = lr_multiplier_tree(st.params, model_name)
    kw = dict(schedule=constant_schedule(0.01), lr_mults=mults,
              optimizer="SGD", opt_cfg=optim.SGDConfig(0.9, 5e-4, False),
              compute_dtype=jnp.bfloat16)
    step = (make_dual_train_step(model, **kw) if dual
            else make_train_step(model, **kw))
    extra = (jnp.float32(1.0), jnp.float32(0.3)) if dual else ()
    b = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                    (batch, side, side, 3), jnp.float32),
         "label": jnp.asarray(
             np.random.RandomState(0)
             .randint(0, 19, size=(batch, side, side)).astype(np.float32))}
    for i in range(2):
        st, m = step(st, b, jax.random.PRNGKey(i), *extra)
    np.asarray(m["loss"])
    shutil.rmtree(LOG, ignore_errors=True)
    with jax.profiler.trace(LOG):
        for i in range(steps):
            st, m = step(st, b, jax.random.PRNGKey(10 + i), *extra)
        np.asarray(m["loss"])
    print(f"traced {steps} steps of {model_name} {side}^2 bs{batch}",
          flush=True)


def parse(steps: int = 3, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa

    files = sorted(glob.glob(os.path.join(LOG, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        sys.exit(f"no xplane under {LOG}; run the trace phase first")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    planes = [p for p in xs.planes if p.name == "/device:TPU:0"]
    if not planes:
        sys.exit("no /device:TPU:0 plane in the trace")
    plane = planes[0]
    emeta = plane.event_metadata
    agg: dict = {}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = emeta[ev.metadata_id].name
            d = agg.setdefault(name, [0.0, 0])
            d[0] += ev.duration_ps / 1e9
            d[1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"total XLA-op device time {total/steps:.1f} ms/step "
          f"over {len(agg)} op names")
    for name, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {ms/steps:8.3f} ms/step x{n//steps:<3d} {name[:120]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--parse":
        parse()
        return
    model = sys.argv[1] if len(sys.argv) > 1 else "deeplab"
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 513
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    trace(model, side, batch)
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python",
               JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, os.path.abspath(__file__), "--parse"],
                   env=env, check=False)


if __name__ == "__main__":
    main()
