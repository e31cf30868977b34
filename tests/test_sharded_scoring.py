"""Multi-chip pool scoring: the MC vote-entropy sweep sharded over a
'pool' device axis (selection/kernels.mc_vote_entropy_maps_sharded) and
GSPMD-partitioned deterministic scorers, validated on the 8-device
virtual CPU mesh against single-device oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep_active_semantic_segmentation_tpu.data.store import MemoryStore
from deep_active_semantic_segmentation_tpu.models.deeplab import DeepLab
from deep_active_semantic_segmentation_tpu.selection import (
    ModelBundle, get_active_selection_class)
from deep_active_semantic_segmentation_tpu.selection import kernels

CROP = 33
NCLS = 5


@pytest.fixture(scope="module")
def bundle():
    model = DeepLab(num_classes=NCLS, backbone="mobilenet", output_stride=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, CROP, CROP, 3), np.float32),
                           train=False)
    return ModelBundle(model, variables["params"], variables["batch_stats"])


@pytest.fixture(scope="module")
def pool_mesh():
    return Mesh(np.asarray(jax.devices()), ("pool",))


def _batch(n, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, size=(n, CROP, CROP, 3)).astype(np.uint8)
    labels = rng.randint(0, NCLS, size=(n, CROP, CROP)).astype(np.uint8)
    labels[:, :3] = 255
    return images, labels


def test_sharded_mc_matches_per_shard_oracle(bundle, pool_mesh):
    """Each shard must produce exactly the single-device kernel's output for
    its slice with the axis-index-folded key — sharding changes placement,
    not math."""
    n_dev = pool_mesh.devices.size
    per = 1
    images, labels = _batch(n_dev * per)
    rng = jax.random.PRNGKey(7)

    sharding = NamedSharding(pool_mesh, P("pool"))
    out = kernels.mc_vote_entropy_maps_sharded(
        pool_mesh, bundle.model, bundle.variables,
        jax.device_put(images, sharding), jax.device_put(labels, sharding),
        rng, NCLS, 4, "dropout", fused_upsample=True)
    out = np.asarray(out)
    assert out.shape == (n_dev * per, CROP, CROP)

    for shard in range(n_dev):
        want = kernels.mc_vote_entropy_maps(
            bundle.model, bundle.variables,
            jnp.asarray(images[shard * per:(shard + 1) * per]),
            jnp.asarray(labels[shard * per:(shard + 1) * per]),
            jax.random.fold_in(rng, shard), NCLS, 4, "dropout",
            fused_upsample=True)
        np.testing.assert_allclose(out[shard * per:(shard + 1) * per],
                                   np.asarray(want), atol=1e-5)


def test_sharded_mc_ignore_mask_zeroed(bundle, pool_mesh):
    images, labels = _batch(pool_mesh.devices.size)
    sharding = NamedSharding(pool_mesh, P("pool"))
    out = np.asarray(kernels.mc_vote_entropy_maps_sharded(
        pool_mesh, bundle.model, bundle.variables,
        jax.device_put(images, sharding), jax.device_put(labels, sharding),
        jax.random.PRNGKey(0), NCLS, 3, "dropout", fused_upsample=True))
    assert (out[:, :3] == 0).all()
    assert np.isfinite(out).all() and out.max() > 0


def test_mc_selector_sharded_end_to_end(bundle, pool_mesh):
    """Selector plumbing: a mesh-constructed MC-dropout selector shards its
    batches, sweeps the pool, and returns a deterministic ranking."""
    rng = np.random.RandomState(3)
    recs = {}
    for i in range(10):
        img = rng.randint(0, 255, size=(40, 56, 3), dtype=np.uint8)
        lab = rng.randint(0, NCLS, size=(40, 56)).astype(np.uint8)
        recs[f"/img_{i}.png".encode()] = np.dstack((img, lab))
    store = MemoryStore(recs)
    mesh2d = Mesh(np.asarray(jax.devices()).reshape(4, 2),
                  ("data", "spatial"))

    sel = get_active_selection_class("variance", NCLS, store, CROP, 8,
                                     mesh=mesh2d)
    assert sel.pool_mesh is not None
    picks = sel.get_vote_entropy_for_images(bundle, store.keys(), 4, seed=5)
    picks2 = sel.get_vote_entropy_for_images(bundle, store.keys(), 4, seed=5)
    assert len(picks) == 4 and set(picks) <= set(store.keys())
    assert picks == picks2

    # indivisible batch -> sharding declined, single-device path
    sel_odd = get_active_selection_class("variance", NCLS, store, CROP, 3,
                                         mesh=mesh2d)
    assert sel_odd.pool_mesh is None
    picks_odd = sel_odd.get_vote_entropy_for_images(bundle, store.keys(), 4,
                                                    seed=5)
    assert len(picks_odd) == 4


def test_ceal_sharded_inputs_match_unsharded(bundle, pool_mesh):
    """Deterministic scorers are pure XLA — with batch-sharded inputs GSPMD
    partitions them over the mesh and every image's score is computed whole
    on one device, so scores match the unsharded run."""
    images, labels = _batch(pool_mesh.devices.size, seed=11)
    sharding = NamedSharding(pool_mesh, P("pool"))
    sharded = kernels.softmax_score_per_image(
        bundle.model, bundle.variables, jax.device_put(images, sharding),
        jax.device_put(labels, sharding), NCLS, "entropy")
    single = kernels.softmax_score_per_image(
        bundle.model, bundle.variables, jnp.asarray(images),
        jnp.asarray(labels), NCLS, "entropy")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


def test_mc_kernel_bf16_compute_dtype(bundle):
    """bf16 MC scoring: runs, respects the ignore mask, and the same-seed
    bf16-vs-f32 entropy delta stays within the f32 seed-to-seed band (the
    MC estimator's own noise floor) — argmax votes are rounding-robust."""
    images, labels = _batch(8, seed=21)
    args = (bundle.model, bundle.variables, jnp.asarray(images),
            jnp.asarray(labels))
    f32_a = np.asarray(kernels.mc_vote_entropy_maps(
        *args, jax.random.PRNGKey(1), NCLS, 6, "dropout",
        compute_dtype="float32"))
    f32_b = np.asarray(kernels.mc_vote_entropy_maps(
        *args, jax.random.PRNGKey(2), NCLS, 6, "dropout",
        compute_dtype="float32"))
    bf16 = np.asarray(kernels.mc_vote_entropy_maps(
        *args, jax.random.PRNGKey(1), NCLS, 6, "dropout",
        compute_dtype="bfloat16"))
    assert bf16.shape == f32_a.shape
    assert (bf16[:, :3] == 0).all()
    assert np.isfinite(bf16).all()
    seed_band = np.abs(f32_a - f32_b).mean()
    delta = np.abs(f32_a - bf16).mean()
    assert delta <= seed_band * 1.5, (delta, seed_band)


def test_backbone_hoist_bitwise_same_forward(bundle):
    """The MC-scan backbone hoist (kernels._mc_vote_entropy) must be
    semantics-preserving: a hoisted forward (backbone computed once,
    dropout->ASPP->decoder applied on the precomputed features) is
    bit-identical to the monolithic forward for the same dropout key —
    the dropout rng folds are module-path based and unchanged."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    variables = {"params": bundle.params, "batch_stats": bundle.batch_stats}
    feats = bundle.model.apply(variables, x, train=False, backbone_only=True)
    for seed in (0, 1, 7):
        key = jax.random.PRNGKey(seed)
        mono = bundle.model.apply(variables, x, train=False, use_dropout=True,
                                  rngs={"dropout": key})
        hoisted = bundle.model.apply(variables, x, train=False,
                                     use_dropout=True, rngs={"dropout": key},
                                     backbone_features=feats)
        assert np.array_equal(np.asarray(mono), np.asarray(hoisted)), seed


def test_backbone_hoist_same_entropy_maps(bundle):
    """End-to-end: the hoisted MC vote-entropy kernel (current code path)
    produces the same maps as a monolithic forward loop for the same seed."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, NCLS, size=(2, CROP, CROP)).astype(np.uint8))
    variables = {"params": bundle.params, "batch_stats": bundle.batch_stats}
    key = jax.random.PRNGKey(11)
    steps = 5

    maps_hoisted = np.asarray(kernels.mc_vote_entropy_maps(
        bundle.model, variables, x, labels, key, NCLS, steps, "dropout"))

    # monolithic oracle: same scan semantics, full forward per step
    from deep_active_semantic_segmentation_tpu.ops import entropy as ent_ops
    votes = []
    for k in jax.random.split(key, steps):
        logits = bundle.model.apply(variables, x, train=False,
                                    use_dropout=True, rngs={"dropout": k})
        votes.append(np.asarray(jnp.argmax(logits, axis=-1)))
    votes = np.stack(votes)
    ent = np.zeros(votes.shape[1:], np.float32)
    for c in range(NCLS):
        p = (votes == c).sum(axis=0).astype(np.float32) / steps
        ent = ent - p * np.log2(p + ent_ops.LOG2_EPS)
    valid = np.asarray(ent_ops.valid_mask(labels, NCLS))
    ent = np.where(valid, ent, 0.0)
    np.testing.assert_allclose(maps_hoisted, ent, atol=1e-5)


def test_packed_mask_wire_identical_maps(bundle):
    """labels_packed wire (1-bit valid mask, 8 px/byte) produces exactly
    the maps of the uint8 label wire — the kernel reads labels only
    through valid_mask, so packing the predicate is semantics-free."""
    images, labels = _batch(4, seed=31)
    packed = np.packbits((labels.astype(np.int32) >= 0)
                         & (labels.astype(np.int32) < NCLS), axis=-1)
    assert packed.shape == (4, CROP, (CROP + 7) // 8)
    key = jax.random.PRNGKey(5)
    want = np.asarray(kernels.mc_vote_entropy_maps(
        bundle.model, bundle.variables, jnp.asarray(images),
        jnp.asarray(labels), key, NCLS, 4, "dropout", fused_upsample=True))
    got = np.asarray(kernels.mc_vote_entropy_maps(
        bundle.model, bundle.variables, jnp.asarray(images),
        jnp.asarray(packed), key, NCLS, 4, "dropout", fused_upsample=True,
        labels_packed=True))
    np.testing.assert_array_equal(got, want)


def test_packed_mask_wire_sharded(bundle, pool_mesh):
    images, labels = _batch(pool_mesh.devices.size, seed=32)
    packed = np.packbits((labels.astype(np.int32) >= 0)
                         & (labels.astype(np.int32) < NCLS), axis=-1)
    sharding = NamedSharding(pool_mesh, P("pool"))
    key = jax.random.PRNGKey(6)
    want = np.asarray(kernels.mc_vote_entropy_maps_sharded(
        pool_mesh, bundle.model, bundle.variables,
        jax.device_put(images, sharding), jax.device_put(labels, sharding),
        key, NCLS, 3, "dropout", fused_upsample=True))
    got = np.asarray(kernels.mc_vote_entropy_maps_sharded(
        pool_mesh, bundle.model, bundle.variables,
        jax.device_put(images, sharding), jax.device_put(packed, sharding),
        key, NCLS, 3, "dropout", fused_upsample=True, labels_packed=True))
    np.testing.assert_array_equal(got, want)
