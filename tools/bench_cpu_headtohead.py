"""Same-CPU MC pool-scoring head-to-head vs the ACTUAL reference.

The reference is CUDA-only on GPU, but its scoring loop runs on CPU via
the test bridge — so this is the one hardware-equalized comparison
available in this environment (BASELINE.md "same-CPU head-to-head"):
identical transplanted weights, identical 20-step MC voting semantics,
one CPU core each. Ours runs the production kernel path (backbone
hoist + lax.scan vote stack + packed 1-bit mask wire).

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        PYTHONPATH=.:tests python tools/bench_cpu_headtohead.py
Prints one JSON line per side.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SIDE, BATCH, NCLS, N_IMGS, MC = 129, 4, 19, 8, 20


def main():
    import numpy as np
    import torch

    import reference_bridge as rb
    import reference_loop as rl

    records = rl.make_learnable_records(N_IMGS, height=SIDE, width=SIDE,
                                        seed=3, split="train")
    paths = sorted(records.keys())

    # --- reference side (torch CPU) ------------------------------------
    rb.install_shims()
    torch.set_num_threads(1)
    sel_mod = rb.import_reference("active_selection.mc_dropout")
    env = rb.FakeLmdbEnv(records, with_keys=True)
    selector = sel_mod.ActiveSelectionMCDropout(NCLS, env, SIDE, BATCH)
    model = rl._build_ref_deeplab(NCLS, mc_dropout=True)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    wrapped = rb.FakeDataParallel(model)

    torch.manual_seed(0)
    selector.get_vote_entropy_for_images(wrapped, paths, 4)  # warmup
    t0 = time.perf_counter()
    torch.manual_seed(1)
    selector.get_vote_entropy_for_images(wrapped, paths, 4)
    ref_rate = N_IMGS / (time.perf_counter() - t0)
    print(json.dumps({"metric": "cpu_mc_scoring_reference",
                      "value": round(ref_rate, 3), "unit": "imgs/sec"}))

    # --- our side (jax CPU, production selector path) ------------------
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.data.store import MemoryStore
    from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
    from deep_active_semantic_segmentation_tpu.models.pretrained import (
        apply_torch_weights, deeplab_state_dict_to_flax)
    from deep_active_semantic_segmentation_tpu.selection.base import ModelBundle
    from deep_active_semantic_segmentation_tpu.selection.mc_dropout import (
        ActiveSelectionMCDropout)

    ours_model = DeepLab(num_classes=NCLS, backbone="mobilenet",
                         output_stride=16, mc_dropout=True)
    variables = ours_model.init({"params": jax.random.PRNGKey(0)},
                                jnp.zeros((1, SIDE, SIDE, 3), jnp.float32),
                                train=False)
    p, s = deeplab_state_dict_to_flax(sd, "mobilenet")
    vs = apply_torch_weights(variables, p, s)
    bundle = ModelBundle(ours_model, vs["params"], vs["batch_stats"])
    store = MemoryStore(dict(records))
    ours = ActiveSelectionMCDropout(NCLS, store, SIDE, BATCH)

    ours.get_vote_entropy_for_images(bundle, paths, 4, seed=0)  # warmup
    t0 = time.perf_counter()
    ours.get_vote_entropy_for_images(bundle, paths, 4, seed=1)
    our_rate = N_IMGS / (time.perf_counter() - t0)
    print(json.dumps({"metric": "cpu_mc_scoring_ours",
                      "value": round(our_rate, 3), "unit": "imgs/sec",
                      "extra": {"speedup_vs_reference":
                                round(our_rate / ref_rate, 3)}}))


if __name__ == "__main__":
    main()
