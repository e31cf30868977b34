"""Space-to-depth packed compute path (ops/s2d.py, models/unet.py).

The packed ops are term-for-term re-expressions: primitives must be exact
(or conv-rounding close); the full packed UNet is compared against the
unpacked path with a noise-calibrated bound, because a random-init UNet
amplifies ~1e-6 reassociation noise by 4 orders of magnitude (measured:
1e-6 input noise -> ~0.06 output delta), so a fixed tiny tolerance would
test the network's conditioning, not the packing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from deep_active_semantic_segmentation_tpu.models.unet import UNet, _BatchNorm
from deep_active_semantic_segmentation_tpu.ops import s2d
from deep_active_semantic_segmentation_tpu.ops.interpolate import (
    max_pool2d, resize_bilinear_align_corners)


def _conv(x, k, pad):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_primitives_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    xp = s2d.space_to_depth(x)

    assert np.array_equal(np.asarray(s2d.depth_to_space(xp)), np.asarray(x))

    k = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    got = s2d.depth_to_space(_conv(xp, s2d.pack_kernel3x3(k), 1))
    ref = _conv(x, k, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)

    k1 = jnp.asarray(rng.randn(1, 1, 3, 7).astype(np.float32))
    got1 = s2d.depth_to_space(_conv(xp, s2d.pack_kernel1x1(k1), 0))
    np.testing.assert_allclose(np.asarray(got1), np.asarray(_conv(x, k1, 0)),
                               rtol=0, atol=1e-5)

    pool_ref = max_pool2d(x, 2)
    assert np.array_equal(np.asarray(s2d.parity_max(xp)), np.asarray(pool_ref))

    # fused packed resize is bit-identical to resize-then-pack (even 2x)
    r_ref = s2d.space_to_depth(resize_bilinear_align_corners(x, 16, 16))
    r_got = s2d.resize_packed(x, 16, 16)
    assert np.array_equal(np.asarray(r_got), np.asarray(r_ref))

    # odd-target packed resize: real cells match resize-then-pad-then-pack,
    # canvas garbage lane arrives exactly zero
    r13 = s2d.resize_packed(x, 13, 15)
    full = resize_bilinear_align_corners(x, 13, 15)
    ref13 = s2d.space_to_depth(jnp.pad(full, ((0, 0), (0, 1), (0, 1), (0, 0))))
    assert np.array_equal(np.asarray(r13), np.asarray(ref13))
    assert np.all(np.asarray(s2d.apply_canvas_masks(r13, 1, 1)) ==
                  np.asarray(r13))

    # split-by-source conv == conv of the packed concat (models/unet.py
    # dconv_up1: conv(s2d(concat(a,b)), K) = conv(s2d(a), pack(K_a)) +
    # conv(s2d(b), pack(K_b)))
    b = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    kc = jnp.asarray(rng.randn(3, 3, 7, 6).astype(np.float32))
    full = _conv(jnp.concatenate([x, b], -1), kc, 1)
    split = (_conv(xp, s2d.pack_kernel3x3(kc[:, :, :3]), 1)
             + _conv(s2d.space_to_depth(b), s2d.pack_kernel3x3(kc[:, :, 3:]), 1))
    np.testing.assert_allclose(np.asarray(s2d.depth_to_space(split)),
                               np.asarray(full), rtol=0, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_packed_batchnorm_matches_flax(dtype):
    import flax.linen as nn

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32) * 3 + 1).astype(dtype)
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=None)
    new = _BatchNorm()
    vr = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    vn = new.init(jax.random.PRNGKey(0), x, use_running_average=False)

    # train mode: output + updated running stats identical
    o_ref, u_ref = ref.apply(vr, x, use_running_average=False,
                             mutable=["batch_stats"])
    o_new, u_new = new.apply(vn, x, use_running_average=False,
                             mutable=["batch_stats"])
    assert o_ref.dtype == o_new.dtype
    np.testing.assert_allclose(np.asarray(o_ref, np.float32),
                               np.asarray(o_new, np.float32), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(u_ref),
                    jax.tree_util.tree_leaves(u_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)

    # packed train mode folds to the same statistics
    o_packed = new.apply(vn, s2d.space_to_depth(x), use_running_average=False,
                         packed=True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(
        np.asarray(s2d.depth_to_space(o_packed), np.float32),
        np.asarray(o_ref, np.float32), rtol=0, atol=1e-5)

    # eval mode
    e_ref = ref.apply(vr, x, use_running_average=True)
    e_new = new.apply(vn, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(e_ref, np.float32),
                               np.asarray(e_new, np.float32), rtol=0, atol=1e-6)


@pytest.mark.parametrize("size", [(64, 64), (33, 33)],
                         ids=["even", "odd-canvas"])
def test_unet_s2d_matches_unpacked(size):
    sh, sw = size
    m_on = UNet(3, 2, use_s2d=True)
    m_off = UNet(3, 2, use_s2d=False)
    x = np.random.RandomState(0).randn(2, sh, sw, 3).astype(np.float32)
    variables = m_on.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, sh, sw, 3)), train=False)

    # identical parameter/stat trees (checkpoint + torch-loader compat)
    f_on = jax.tree_util.tree_leaves_with_path(variables)
    f_off = jax.tree_util.tree_leaves_with_path(
        m_off.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, sh, sw, 3)), train=False))
    assert len(f_on) == len(f_off)
    for (p1, l1), (p2, l2) in zip(f_on, f_off):
        assert p1 == p2 and l1.shape == l2.shape
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    # mathematical equivalence, tested sharply in float64: a random-init
    # UNet amplifies f32 reassociation noise by ~5 orders of magnitude
    # (1e-6 input noise -> ~0.06 output delta), so f32 comparisons test
    # conditioning, not the packing; in f64 the reassociation floor is
    # ~1e-13 and tight tolerances are meaningful
    with jax.enable_x64(True):
        v64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), variables)
        x64 = jnp.asarray(x, jnp.float64)

        y_on = np.asarray(m_on.apply(v64, x64, train=False))
        y_off = np.asarray(m_off.apply(v64, x64, train=False))
        np.testing.assert_allclose(y_on, y_off, rtol=0, atol=1e-9)

        o_on, u_on = m_on.apply(v64, x64, train=True,
                                mutable=["batch_stats"])
        o_off, u_off = m_off.apply(v64, x64, train=True,
                                   mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(o_on), np.asarray(o_off),
                                   rtol=0, atol=1e-9)
        for a, b in zip(jax.tree_util.tree_leaves(u_on),
                        jax.tree_util.tree_leaves(u_off)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-11)

        def loss_at(params, mod):
            out = mod.apply({"params": params,
                             "batch_stats": v64["batch_stats"]},
                            x64, train=True, mutable=["batch_stats"])[0]
            return jnp.mean(out * out)

        g_on = jax.grad(loss_at)(v64["params"], m_on)
        g_off = jax.grad(loss_at)(v64["params"], m_off)
        for a, b in zip(jax.tree_util.tree_leaves(g_on),
                        jax.tree_util.tree_leaves(g_off)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-9)


def test_unet_s2d_disabled_is_plain_path():
    """use_s2d=False is the plain unpacked path (the escape hatch config
    knob) — spot-check it still traces and differs only by reassociation
    noise from the packed default at an odd (canvas) size."""
    m_on = UNet(3, 2, use_s2d=True)
    m_off = UNet(3, 2, use_s2d=False)
    x = np.random.RandomState(3).randn(1, 33, 33, 3).astype(np.float32)
    variables = m_on.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 33, 33, 3)), train=False)
    a = np.asarray(m_on.apply(variables, x, train=False))
    b = np.asarray(m_off.apply(variables, x, train=False))
    assert a.shape == b.shape and np.isfinite(a).all()
