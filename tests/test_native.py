"""Native C++ host data path: bit-parity against PIL and the fused
normalize, plus the transforms routing."""

import numpy as np
import pytest
from PIL import Image

from deep_active_semantic_segmentation_tpu.data import native
from deep_active_semantic_segmentation_tpu.data import transforms as tr

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.mark.parametrize("hw", [(1024, 2048, 513, 1026), (100, 150, 65, 98),
                                (40, 60, 80, 120), (7, 13, 5, 9)])
def test_native_bilinear_bit_identical_to_pil(hw):
    h, w, oh, ow = hw
    rng = np.random.RandomState(h + w)
    x = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
    ours = native.resize_u8(x, oh, ow, "bilinear")
    ref = np.array(Image.fromarray(x).resize((ow, oh), Image.BILINEAR))
    assert np.array_equal(ours, ref)


@pytest.mark.parametrize("hw", [(1024, 2048, 513, 1026), (100, 150, 65, 98),
                                (64, 64, 33, 33), (513, 513, 129, 129)])
def test_native_nearest_bit_identical_to_pil(hw):
    h, w, oh, ow = hw
    rng = np.random.RandomState(h * 2 + w)
    m = rng.randint(0, 19, size=(h, w)).astype(np.uint8)
    ours = native.resize_u8(m, oh, ow, "nearest")
    ref = np.array(Image.fromarray(m).resize((ow, oh), Image.NEAREST))
    assert np.array_equal(ours, ref)


def test_native_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, size=(50, 70, 3), dtype=np.uint8)
    mean, std = tr.IMAGENET_MEAN, tr.IMAGENET_STD
    ours = native.normalize(x, mean, std)
    ref = (x.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    assert np.allclose(ours, ref, atol=1e-6)


def test_imresize_routes_through_native(monkeypatch):
    rng = np.random.RandomState(1)
    x = rng.randint(0, 255, size=(64, 96, 3), dtype=np.uint8)
    via_native = tr.imresize(x, (33, 49))
    monkeypatch.setattr(native, "resize_u8", lambda *a, **k: None)
    via_pil = tr.imresize(x, (33, 49))
    assert np.array_equal(via_native, via_pil)
