"""Transform numerics + inverse-crop geometry vs literal reference formulas."""

import numpy as np
from PIL import Image

from deep_active_semantic_segmentation_tpu.data import transforms as tr


def _img(h, w, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(h, w, c) if c else (h, w)).astype(np.uint8)


def test_imresize_matches_pil_definition():
    x = _img(40, 60)
    out = tr.imresize(x, (20, 30))
    ref = np.array(Image.fromarray(x).resize((30, 20), Image.BILINEAR))
    assert np.array_equal(out, ref)
    m = _img(40, 60, c=0)
    outn = tr.imresize(m, (20, 30), "nearest")
    refn = np.array(Image.fromarray(m).resize((30, 20), Image.NEAREST))
    assert np.array_equal(outn, refn)


def test_fix_scale_crop_geometry_cityscapes():
    # 1024x2048 -> short side 513 => (513, 1026), center crop 513^2
    sample = {"image": _img(64, 128), "label": _img(64, 128, c=0)}
    out = tr.FixScaleCrop(33)(sample)
    assert out["image"].shape == (33, 33, 3)
    assert out["label"].shape == (33, 33)
    # crop offset matches reference formula
    oh, ow = 33, 66
    x1 = int(round((ow - 33) / 2.0))
    ref_img = tr.imresize(sample["image"], (oh, ow))[:, x1:x1 + 33]
    assert np.array_equal(out["image"], ref_img)


def test_scale_with_padding_letterbox():
    sample = {"image": _img(50, 100), "label": _img(50, 100, c=0)}
    out = tr.ScaleWithPadding(64)(sample)
    assert out["image"].shape == (64, 64, 3)
    # oh = 50*64/100 = 32 (even), content rows [32-16, 32+16)
    assert np.all(out["label"][:16, :] == 255)
    assert np.all(out["label"][48:, :] == 255)
    assert not np.all(out["label"][16:48, :] == 255)


def test_normalize():
    sample = {"image": np.full((4, 4, 3), 255, np.uint8),
              "label": np.zeros((4, 4), np.uint8)}
    out = tr.Normalize(mean=tr.IMAGENET_MEAN, std=tr.IMAGENET_STD)(sample)
    expected = (1.0 - np.array(tr.IMAGENET_MEAN)) / np.array(tr.IMAGENET_STD)
    assert np.allclose(out["image"][0, 0], expected, atol=1e-6)


def _reference_invert_fix_scale_crop(label, output, region, crop_size):
    """Literal re-derivation of custom_transforms.py:300-315."""
    h, w = label.shape
    if w > h:
        oh = crop_size
        ow = int(1.0 * w * oh / h)
    else:
        ow = crop_size
        oh = int(1.0 * h * ow / w)
    x1 = int(round((ow - crop_size) / 2.))
    y1 = int(round((oh - crop_size) / 2.))
    b0 = round((region[0] + y1) * (h / oh))
    b1 = round((region[1] + x1) * (w / ow))
    b2 = round(region[2] * (h / oh))
    b3 = round(region[3] * (w / ow))
    output[b0: b0 + b2, b1: b1 + b3] = label[b0: b0 + b2, b1: b1 + b3]


def test_invert_fix_scale_crop_matches_reference():
    rng = np.random.RandomState(0)
    label = rng.randint(0, 19, size=(64, 128)).astype(np.uint8)
    for region in [(0, 0, 33, 33), (5, 10, 16, 16), (20, 1, 12, 12)]:
        ours = np.full_like(label, 255)
        ref = np.full_like(label, 255)
        tr.invert_fix_scale_crop(label, ours, region, 33)
        _reference_invert_fix_scale_crop(label, ref, region, 33)
        assert np.array_equal(ours, ref)
        assert (ours != 255).any()


def _reference_invert_scale_crop(label, output, region, base_size):
    """Literal re-derivation of custom_transforms.py:318-342."""
    h, w = label.shape
    if w < h:
        oh = base_size
        ow = int(1.0 * w * oh / h)
        if ow % 2 != 0:
            ow += 1
    else:
        ow = base_size
        oh = int(1.0 * h * ow / w)
        if oh % 2 != 0:
            oh += 1
    padding_h = abs(base_size - oh) // 2
    padding_w = abs(base_size - ow) // 2
    b0 = round((max(region[0] - padding_h, 0)) * (h / oh))
    b1 = round(max((region[1] - padding_w), 0) * (w / ow))
    b2 = round(region[2] * (h / oh))
    b3 = round(region[3] * (w / ow))
    output[b0: b0 + b2, b1: b1 + b3] = label[b0: b0 + b2, b1: b1 + b3]


def test_invert_scale_crop_matches_reference():
    rng = np.random.RandomState(1)
    label = rng.randint(0, 21, size=(50, 100)).astype(np.uint8)
    for region in [(0, 0, 64, 64), (20, 10, 16, 16), (30, 40, 8, 8)]:
        ours = np.full_like(label, 255)
        ref = np.full_like(label, 255)
        tr.invert_scale_crop(label, ours, region, 64)
        _reference_invert_scale_crop(label, ref, region, 64)
        assert np.array_equal(ours, ref)


def test_flip_and_blur_deterministic_under_seed():
    import random
    sample = {"image": _img(16, 16), "label": _img(16, 16, c=0)}
    random.seed(123)
    a = tr.Compose([tr.RandomHorizontalFlip(), tr.RandomGaussianBlur()])(dict(sample))
    random.seed(123)
    b = tr.Compose([tr.RandomHorizontalFlip(), tr.RandomGaussianBlur()])(dict(sample))
    assert np.array_equal(a["image"], b["image"])


def test_windowed_resize_bit_equals_full_then_crop():
    """native.resize_u8_window (the FixScaleCrop crop-fused fast path) must
    be byte-identical to resize-then-slice for every interp/shape/window,
    including the 1x1 corner window that exercises coefficient-range
    boundary handling."""
    from deep_active_semantic_segmentation_tpu.data import native

    if not native.available():  # CI hosts without g++: covered by fallback
        import pytest

        pytest.skip("native library unavailable")
    for (h, w, c) in [(64, 128, 3), (128, 64, 3), (37, 53, 0), (7, 13, 3)]:
        arr = _img(h, w, c=c, seed=h + w)
        for (oh, ow) in [(33, 66), (17, 11), (2 * h, 2 * w)]:
            for interp in ("bilinear", "nearest"):
                full = tr.imresize(arr, (oh, ow), interp)
                for (x1, y1, cw, ch) in [(0, 0, ow, oh),
                                         ((ow - 5) // 2, (oh - 5) // 2, 5, 5),
                                         (ow // 3, oh // 4,
                                          ow - ow // 3, oh - oh // 4),
                                         (ow - 1, oh - 1, 1, 1)]:
                    win = native.resize_u8_window(
                        arr, oh, ow, x1, y1, cw, ch, interp)
                    assert np.array_equal(
                        win, full[y1:y1 + ch, x1:x1 + cw]), (
                        h, w, oh, ow, interp, x1, y1, cw, ch)


def test_fix_scale_crop_native_matches_fallback(monkeypatch):
    """FixScaleCrop{,ImageOnly} output is invariant to DASS_NATIVE."""
    from deep_active_semantic_segmentation_tpu.data import native

    sample = {"image": _img(64, 128, seed=3), "label": _img(64, 128, c=0)}
    fast = tr.FixScaleCrop(33)(sample)
    fast_img = tr.FixScaleCropImageOnly(33)(sample["image"])
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setenv("DASS_NATIVE", "0")
    slow = tr.FixScaleCrop(33)(sample)
    assert np.array_equal(fast["image"], slow["image"])
    assert np.array_equal(fast["label"], slow["label"])
    assert np.array_equal(fast_img, tr.FixScaleCropImageOnly(33)(
        sample["image"]))
