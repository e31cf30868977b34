"""Entropy / region / greedy-selection kernels vs numpy oracles that
re-derive the reference algorithms (mc_dropout.py, ceal.py, core_set.py,
max_subset.py)."""

import numpy as np
import torch
import torch.nn.functional as F

from deep_active_semantic_segmentation_tpu.ops import distance, entropy, region


def test_vote_entropy_matches_reference_math():
    rng = np.random.RandomState(0)
    S, C, H, W = 20, 5, 16, 16
    votes = rng.randint(0, C, size=(S, H, W))
    counts = np.zeros((H, W, C), np.float32)
    for s in range(S):
        for c in range(C):
            counts[..., c] += votes[s] == c
    # reference mc_dropout.py:46-48
    expected = np.zeros((H, W), np.float32)
    for c in range(C):
        p = (votes == c).sum(0).astype(np.float32) / S
        expected -= p * np.log2(p + 1e-12)
    ours = np.asarray(entropy.vote_entropy_from_counts(counts, S))
    assert np.allclose(ours, expected, atol=1e-5)

    labels = rng.randint(0, C + 2, size=(H, W)).astype(np.float32)
    labels[labels >= C] = 255
    masked = np.asarray(entropy.masked_vote_entropy(counts, labels, S, C))
    assert np.allclose(masked[labels == 255], 0.0)
    assert np.allclose(masked[labels != 255], expected[labels != 255], atol=1e-5)


def test_softmax_scores_match_torch():
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 8, 8, 6
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, size=(B, H, W)).astype(np.float32)
    labels[0, 0, :] = 255
    p = F.softmax(torch.from_numpy(logits), dim=-1).numpy()

    ent_ref = -(p * np.log2(p + 1e-12)).sum(-1)
    ent_ref[labels == 255] = 0
    assert np.allclose(np.asarray(entropy.softmax_entropy(logits, labels, C)),
                       ent_ref, atol=1e-5)

    conf_ref = p.max(-1)
    conf_ref[labels == 255] = 1
    assert np.allclose(np.asarray(entropy.max_confidence(logits, labels, C)),
                       conf_ref, atol=1e-6)

    sp = np.sort(p, axis=-1)
    margin_ref = sp[..., -1] - sp[..., -2]
    margin_ref[labels == 255] = 1
    assert np.allclose(np.asarray(entropy.margin(logits, labels, C)),
                       margin_ref, atol=1e-6)


def test_box_sum_matches_torch_conv():
    rng = np.random.RandomState(2)
    maps = rng.rand(3, 40, 40).astype(np.float32)
    k = 9
    ours = np.asarray(region.box_sum_valid(maps, k))
    w = torch.ones(1, 1, k, k)
    ref = F.conv2d(torch.from_numpy(maps)[:, None], w).numpy()[:, 0]
    assert ours.shape == ref.shape == (3, 32, 32)
    assert np.allclose(ours, ref, atol=1e-3)


def _reference_square_nms(score_maps, region_size, max_selection_count,
                          threshold=0.01):
    """Literal numpy re-derivation of mc_dropout.py:82-108."""
    import math
    score_maps = score_maps.copy()
    n, S1, S2 = score_maps.shape
    selected = [[] for _ in range(n)]
    count = 0
    for _ in range(math.ceil(max_selection_count)):
        a = score_maps.reshape(-1).argmax()
        i, r, c = a // (S1 * S2), (a // S2) % S1, a % S2
        selected[i].append((int(r), int(c), region_size, region_size))
        count += 1
        r0, c0 = max(0, r - region_size), max(0, c - region_size)
        r1, c1 = min(S1, r + region_size), min(S2, c + region_size)
        score_maps[i, r0:r1, c0:c1] = 0
        if score_maps.max() < threshold:
            break
    return selected, count


def test_square_nms_matches_reference_selection_order():
    rng = np.random.RandomState(3)
    maps = rng.rand(5, 30, 30).astype(np.float32)
    ours_sel, ours_n = region.square_nms(maps.copy(), 7, 20)
    ref_sel, ref_n = _reference_square_nms(maps, 7, 20)
    assert ours_n == ref_n
    assert ours_sel == ref_sel


def test_square_nms_early_stop():
    maps = np.zeros((2, 20, 20), np.float32)
    maps[0, 5, 5] = 1.0
    maps[1, 2, 2] = 0.5
    sel, n = region.square_nms(maps, 4, 100)
    assert n == 2
    assert sel[0] == [(5, 5, 4, 4)]
    assert sel[1] == [(2, 2, 4, 4)]


def test_suppression_multiplier():
    mult = region.suppression_multiplier((10, 10), [(2, 3, 4, 5)])
    assert mult[2, 3] == 0 and mult[5, 7] == 0
    assert mult[1, 3] == 1 and mult[6, 3] == 1 and mult[2, 8] == 1
    assert region.suppression_multiplier((4, 4), []).min() == 1.0


def _reference_kcenter(features, seed_indices, N):
    """Literal re-derivation of core_set.py:17-38 with sklearn-free numpy."""
    def dists(centers, feats):
        return np.sqrt(((feats[:, None, :] - feats[centers][None, :, :]) ** 2).sum(-1))

    min_d = dists(seed_indices, features).min(axis=1)
    picked = []
    for _ in range(N):
        ind = int(min_d.argmax())
        picked.append(ind)
        d = np.sqrt(((features - features[ind]) ** 2).sum(-1))
        min_d = np.minimum(min_d, d)
    return picked


def test_kcenter_greedy_matches_reference():
    rng = np.random.RandomState(4)
    feats = rng.randn(60, 8).astype(np.float32)
    seed = np.zeros(60, bool)
    seed[:5] = True
    ours = list(np.asarray(distance.kcenter_greedy(feats, seed, 10)))
    ref = _reference_kcenter(feats, list(range(5)), 10)
    assert ours == ref


def _reference_max_representative(all_f, cand_f, n):
    """Literal re-derivation of max_subset.py:17-39."""
    d = np.sqrt(((all_f[:, None, :] - cand_f[None, :, :]) ** 2).sum(-1))
    selected = []
    min_d = np.full(len(all_f), np.inf)
    for _ in range(n):
        best_score, best_i, best_d = -np.inf, None, None
        for i in range(len(cand_f)):
            if i in selected:
                continue
            tmp = np.minimum(min_d, d[:, i])
            score = -tmp.sum()
            if score > best_score:
                best_score, best_i, best_d = score, i, tmp
        selected.append(best_i)
        min_d = best_d
    return selected


def test_max_representative_matches_reference():
    rng = np.random.RandomState(5)
    all_f = rng.randn(40, 6).astype(np.float32)
    cand_f = rng.randn(12, 6).astype(np.float32)
    ours = list(np.asarray(distance.max_representative(all_f, cand_f, 6)))
    ref = _reference_max_representative(all_f, cand_f, 6)
    assert ours == ref


def test_num_requested_regions():
    # active_train.py:461: 125 images * 513^2 / 129^2
    assert abs(region.num_requested_regions(125, 513, 129)
               - 125 * 513 * 513 / (129 * 129)) < 1e-9


def test_tconv2x_argmax_matches_full_tconv():
    """The parity-decomposed fused tconv+argmax (ops/tconv_votes.py) must
    produce the same votes as argmax over the full ConvTranspose2dTorch
    output — including torch as the ground truth for the tconv itself."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models.enet import (
        ConvTranspose2dTorch)
    from deep_active_semantic_segmentation_tpu.ops import tconv_votes

    rng = np.random.RandomState(5)
    B, h, w, Cin, Cout = 2, 12, 10, 16, 19
    x = rng.randn(B, h, w, Cin).astype(np.float32)
    mod = ConvTranspose2dTorch(Cout, 3, 2, 1, 1)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = mod.apply(variables, jnp.asarray(x))
    assert full.shape == (B, 2 * h, 2 * w, Cout)

    # torch oracle for the tconv itself: our kernel is the spatially
    # flipped torch weight (models/pretrained.py _tconv) — invert that
    K = np.asarray(variables["params"]["kernel"])  # (3,3,Cin,Cout)
    tk = torch.from_numpy(np.ascontiguousarray(
        np.transpose(K[::-1, ::-1], (2, 3, 0, 1))))  # (Cin,Cout,kh,kw)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    full_t = F.conv_transpose2d(xt, tk, stride=2, padding=1,
                                output_padding=1).numpy()
    np.testing.assert_allclose(np.transpose(full_t, (0, 2, 3, 1)),
                               np.asarray(full), atol=1e-4)

    votes_full = np.argmax(np.asarray(full), axis=-1)
    votes_fused = np.asarray(tconv_votes.tconv2x_argmax(
        jnp.asarray(x), variables["params"]["kernel"]))
    assert votes_fused.shape == (B, 2 * h, 2 * w)
    assert np.array_equal(votes_full, votes_fused)


def test_enet_fused_mc_votes_match_unfused():
    """End-to-end: the ENet MC vote-entropy kernel with fused_upsample=True
    (parity tconv votes) must produce the same entropy maps as the
    unfused full-logits path for the same seed."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models.enet import ENet
    from deep_active_semantic_segmentation_tpu.selection import kernels

    ncls = 7
    model = ENet(num_classes=ncls)
    rngs = np.random.RandomState(2)
    x = jnp.asarray(rngs.randn(2, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rngs.randint(0, ncls, size=(2, 32, 32)).astype(np.uint8))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    key = jax.random.PRNGKey(4)
    fused = np.asarray(kernels.mc_vote_entropy_maps(
        model, variables, x, labels, key, ncls, 4, "dropout",
        fused_upsample=True))
    unfused = np.asarray(kernels.mc_vote_entropy_maps(
        model, variables, x, labels, key, ncls, 4, "dropout",
        fused_upsample=False))
    assert np.array_equal(fused, unfused)


def test_enet_prefix_hoist_bitwise_same_forward():
    """The ENet MC-scan deterministic-prefix hoist (models/enet.py
    prefix_only/prefix_features, consumed by kernels._mc_vote_entropy) must
    be semantics-preserving: a hoisted forward (InitialBlock + the
    pre-dropout half of downsample1_0 computed once) is bit-identical to
    the monolithic forward for the same dropout key — the dropout rng folds
    are module-path based and all module paths are unchanged."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models.enet import ENet

    model = ENet(num_classes=7)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    prefix = model.apply(variables, x, train=False, prefix_only=True)
    main, idx, ext = prefix
    assert main.shape == (2, 8, 8, 64)     # padded pool main, stage-1 res
    assert idx.shape == (2, 8, 8, 16)      # pool selector planes
    assert ext.shape == (2, 8, 8, 64)      # pre-dropout ext branch
    for seed in (0, 3, 9):
        key = jax.random.PRNGKey(seed)
        mono = model.apply(variables, x, train=False, use_dropout=True,
                           rngs={"dropout": key})
        hoisted = model.apply(variables, x, train=False, use_dropout=True,
                              rngs={"dropout": key}, prefix_features=prefix)
        assert np.array_equal(np.asarray(mono), np.asarray(hoisted)), seed


def test_enet_mc_maps_match_monolithic_oracle():
    """End-to-end: the ENet MC vote-entropy kernel (stem hoist + fused
    parity tconv votes, the production path) produces the same maps as a
    monolithic full-forward python loop for the same seed."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models.enet import ENet
    from deep_active_semantic_segmentation_tpu.ops import entropy as ent_ops
    from deep_active_semantic_segmentation_tpu.selection import kernels

    ncls = 7
    model = ENet(num_classes=ncls)
    rngs = np.random.RandomState(8)
    x = jnp.asarray(rngs.randn(2, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rngs.randint(0, ncls, size=(2, 32, 32)).astype(np.uint8))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    key = jax.random.PRNGKey(12)
    steps = 4
    maps = np.asarray(kernels.mc_vote_entropy_maps(
        model, variables, x, labels, key, ncls, steps, "dropout",
        fused_upsample=True))

    from deep_active_semantic_segmentation_tpu.selection.kernels import (
        normalize_on_device)
    xn = normalize_on_device(x)
    votes = []
    for k in jax.random.split(key, steps):
        logits = model.apply(variables, xn, train=False, use_dropout=True,
                             rngs={"dropout": k})
        votes.append(np.asarray(jnp.argmax(logits, axis=-1)))
    votes = np.stack(votes)
    ent = np.zeros(votes.shape[1:], np.float32)
    for c in range(ncls):
        p = (votes == c).sum(axis=0).astype(np.float32) / steps
        ent = ent - p * np.log2(p + ent_ops.LOG2_EPS)
    valid = np.asarray(ent_ops.valid_mask(labels, ncls))
    np.testing.assert_allclose(maps, np.where(valid, ent, 0.0), atol=1e-5)


def test_square_nms_device_matches_host_exactly():
    """The device while_loop NMS (ops/region.square_nms_device — only the
    box list crosses the wire) must be bit-equal to the host NMS on the
    same f32 maps: identical tie-breaking, suppression geometry, stop rule,
    on the reference's PNG fixtures and randomized maps."""
    import jax.numpy as jnp
    from PIL import Image

    from deep_active_semantic_segmentation_tpu.ops import region as region_ops

    def both(maps, region_size, count):
        host = region_ops.square_nms(maps.copy(), region_size, count)
        boxes, k = region_ops.square_nms_device(
            jnp.asarray(maps), region_size=region_size,
            max_count=int(np.ceil(count)), stop_threshold=0.01)
        dev = region_ops.device_boxes_to_regions(
            np.asarray(boxes), int(k), maps.shape[0], region_size)
        return host, dev

    # fixtures at the reference geometry, normalized like the pipeline
    img0 = np.asarray(Image.open("tests/fixtures/nms_0.png"),
                      dtype=np.float32) / 256
    img1 = np.asarray(Image.open("tests/fixtures/nms_1.png"),
                      dtype=np.float32) / 256
    maps = np.asarray(region_ops.box_sum_valid(
        jnp.stack([jnp.asarray(img0), jnp.asarray(img1)]), 127))
    maps = (maps - maps.min()) / (maps.max() - maps.min())
    (h_regions, h_count), (d_regions, d_count) = both(maps, 127,
                                                      (512 * 512) // 127 ** 2)
    assert h_count == d_count and h_regions == d_regions

    for seed in range(6):
        rng = np.random.RandomState(seed)
        maps = rng.rand(4, 60, 57).astype(np.float32)
        if seed % 2:  # exercise the early-stop path
            maps *= 0.02
        (h_regions, h_count), (d_regions, d_count) = both(maps, 13, 25.5)
        assert h_count == d_count, seed
        assert h_regions == d_regions, seed


def test_tconv2x_argmax_bf16_disagreement_bounded():
    """Under bf16 scoring the fused path argmaxes f32 MXU accumulations
    while the unfused module rounds its output logits to bf16 first
    (ops/tconv_votes.py docstring) — vote flips are possible only at
    near-tie pixels. Bound the disagreement rate well inside the
    bf16-vs-f32 MC-voting band validated in BASELINE.md."""
    import jax
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.models.enet import (
        ConvTranspose2dTorch)
    from deep_active_semantic_segmentation_tpu.ops import tconv_votes

    rng = np.random.RandomState(11)
    B, h, w, Cin, Cout = 2, 16, 16, 16, 19
    x32 = rng.randn(B, h, w, Cin).astype(np.float32)
    mod = ConvTranspose2dTorch(Cout, 3, 2, 1, 1)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x32))
    vbf = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), variables)
    xbf = jnp.asarray(x32, jnp.bfloat16)

    votes_unfused = np.argmax(np.asarray(
        mod.apply(vbf, xbf), np.float32), axis=-1)
    votes_fused = np.asarray(tconv_votes.tconv2x_argmax(
        xbf, vbf["params"]["kernel"]))
    rate = float(np.mean(votes_unfused != votes_fused))
    assert rate < 0.02, rate


def test_square_nms_device_bucketed_limit_matches_exact_max_count():
    """region_pipeline buckets the static box-buffer size (compile-cache
    reuse across AL rounds) and passes the requested count as a dynamic
    limit — the selected boxes must be identical to an exact-size run."""
    import jax.numpy as jnp

    from deep_active_semantic_segmentation_tpu.ops import region as region_ops

    rng = np.random.RandomState(11)
    maps = rng.rand(3, 40, 44).astype(np.float32) + 0.5  # never early-stops
    for req in (1, 5, 17):
        exact_b, exact_k = region_ops.square_nms_device(
            jnp.asarray(maps), region_size=9, max_count=req,
            stop_threshold=0.01)
        buck_b, buck_k = region_ops.square_nms_device(
            jnp.asarray(maps), region_size=9, max_count=256,
            stop_threshold=0.01, limit=req)
        assert int(exact_k) == int(buck_k) == req
        assert np.array_equal(np.asarray(exact_b)[:req],
                              np.asarray(buck_b)[:req])


def test_region_nms_uniform_maps_stop_after_one_box():
    """Degenerate all-equal score maps (e.g. a fully-suppressed pool) used
    to min-max normalize to NaN: the reference's NMS then burns the full
    request on NaN comparisons. The guarded pipeline ranks a uniform pool
    as all-zero, so the threshold stop fires after a single box — in both
    the device and host NMS paths."""
    import os

    from deep_active_semantic_segmentation_tpu.selection.region_pipeline import (
        create_region_maps_from_scorer)

    class _Loader:
        def __iter__(self):
            yield {"nvalid": 2, "image": np.zeros((2, 24, 24, 3), np.float32)}

    def scorer(batch):
        import jax.numpy as jnp
        return jnp.ones((2, 24, 24), jnp.float32)  # uniform scores

    for mode in ("device", "host"):
        os.environ["DASS_REGION_NMS"] = mode
        try:
            regions, count = create_region_maps_from_scorer(
                scorer, _Loader(), [b"a", b"b"], [[], []],
                region_size=8, selection_size=4, base_size=24)
        finally:
            os.environ.pop("DASS_REGION_NMS", None)
        assert count == 1, mode
        assert not np.isnan(count)
