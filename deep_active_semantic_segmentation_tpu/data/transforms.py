"""Numpy sample transforms with reference-exact numerics.

Parity target: reference dataloaders/custom_transforms.py. Samples are
``{'image': HxWxC, 'label': HxW}`` numpy arrays; output stays HWC float32
(our models are NHWC — there is no ToTensor/CHW step).

Resizing reproduces the deprecated ``scipy.misc.imresize`` the reference
depends on (custom_transforms.py:5): uint8 arrays routed through PIL with
the requested resample mode — the exact same code path old scipy used, so
results are bit-identical for uint8 inputs. This matters for the
selection-rank-agreement north star (SURVEY.md section 6).

The region-coordinate inverse mappings ``invert_fix_scale_crop`` /
``invert_scale_crop`` (custom_transforms.py:300-342) copy ground-truth
pixels of a selected crop-space box back into a full-resolution 255-filled
mask; they are pure index arithmetic reproduced here with golden tests.
"""

from __future__ import annotations

import random
from typing import Tuple

import numpy as np
from PIL import Image
from scipy.ndimage import gaussian_filter

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imresize(arr: np.ndarray, size: Tuple[int, int], interp: str = "bilinear") -> np.ndarray:
    """scipy.misc.imresize replica for uint8 inputs: PIL resize.

    size is (height, width), matching the scipy/reference convention.
    Routes through the native C++ resampler (data/native.py, bit-identical
    to PIL, OpenMP across rows) when it is available; PIL otherwise.
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        # old scipy bytescaled non-uint8 input; the reference only ever
        # resizes uint8 data, so clip-cast is sufficient here.
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    oh, ow = int(size[0]), int(size[1])
    if interp in ("bilinear", "nearest"):
        from deep_active_semantic_segmentation_tpu.data import native

        out = native.resize_u8(arr, oh, ow, interp)
        if out is not None:
            return out
    resample = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR,
                "bicubic": Image.BICUBIC, "lanczos": Image.LANCZOS}[interp]
    return np.array(Image.fromarray(arr).resize((ow, oh), resample))


def _imresize_crop(arr: np.ndarray, oh: int, ow: int, x1: int, y1: int,
                   cw: int, ch: int, interp: str = "bilinear") -> np.ndarray:
    """``imresize(arr, (oh, ow), interp)[y1:y1+ch, x1:x1+cw]`` — through
    the native crop-windowed resampler when available (bit-equal, skips
    the out-of-crop resample work), else the literal fallback."""
    arr = np.asarray(arr)
    if (arr.dtype == np.uint8 and interp in ("bilinear", "nearest")
            and 0 <= x1 and 0 <= y1 and x1 + cw <= ow and y1 + ch <= oh):
        from deep_active_semantic_segmentation_tpu.data import native

        out = native.resize_u8_window(arr, oh, ow, x1, y1, cw, ch, interp)
        if out is not None:
            return out
    return imresize(arr, (oh, ow), interp)[y1:y1 + ch, x1:x1 + cw]


def _short_side_dims(w: int, h: int, target: int) -> Tuple[int, int]:
    """(oh, ow) scaling the short side to ``target`` (FixScaleCrop rule)."""
    if w > h:
        oh = target
        ow = int(1.0 * w * oh / h)
    else:
        ow = target
        oh = int(1.0 * h * ow / w)
    return oh, ow


class Normalize:
    """custom_transforms.py:9-30: /255, subtract mean, divide std."""

    def __init__(self, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample):
        img = sample["image"].astype(np.float32)
        mask = sample["label"].astype(np.float32)
        img = img / 255.0
        img = (img - self.mean) / self.std
        return {"image": img, "label": mask}


class NormalizeImageOnly:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img):
        img = img.astype(np.float32) / 255.0
        return (img - self.mean) / self.std


class ToUint8Wire:
    """Terminal stage of the uint8 device-normalize wire (replaces the
    trailing host Normalize): keeps the geometry stages' uint8 image —
    casting back exactly where a stage produced an integer-VALUED f32
    buffer (ScaleWithPadding's letterbox) — and the uint8 label. The
    /255-mean/std normalize runs on device with bit-identical f32 math
    (selection/kernels.normalize_on_device; equality asserted in
    tests/test_data_layer.py), cutting the bandwidth-bound host->device
    train wire from 16 to 4 bytes/pixel."""

    def __call__(self, sample):
        return {"image": np.asarray(sample["image"]).astype(np.uint8),
                "label": np.asarray(sample["label"]).astype(np.uint8)}


class RandomHorizontalFlip:
    """custom_transforms.py:57-69."""

    def __call__(self, sample):
        img, mask = sample["image"], sample["label"]
        if random.random() < 0.5:
            img = np.fliplr(img)
            mask = np.fliplr(mask)
        return {"image": img, "label": mask}


class RandomGaussianBlur:
    """custom_transforms.py:88-97: blur across ALL axes (channels included),
    sigma ~ U(0,1), applied with p=0.5 to the (uint8) image only."""

    def __call__(self, sample):
        img, mask = sample["image"], sample["label"]
        if random.random() < 0.5:
            img = gaussian_filter(img, sigma=random.random())
        return {"image": img, "label": mask}


class RandomRotate:
    """custom_transforms.py:72-85 (PIL-image based; unused by the drivers)."""

    def __init__(self, degree):
        self.degree = degree

    def __call__(self, sample):
        img = Image.fromarray(np.asarray(sample["image"]))
        mask = Image.fromarray(np.asarray(sample["label"]))
        deg = random.uniform(-self.degree, self.degree)
        return {"image": np.array(img.rotate(deg, Image.BILINEAR)),
                "label": np.array(mask.rotate(deg, Image.NEAREST))}


class RandomScaleCrop:
    """custom_transforms.py:100-135: random short-side scale, pad, random crop."""

    def __init__(self, base_size, crop_size, fill=0):
        self.base_size = base_size
        self.crop_size = crop_size
        self.fill = fill

    def __call__(self, sample):
        img = np.asarray(sample["image"])
        mask = np.asarray(sample["label"])
        short_size = random.randint(int(self.base_size * 0.5), int(self.base_size * 2.0))
        h, w = img.shape[0], img.shape[1]
        if h > w:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        else:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        img = imresize(img, (oh, ow))
        mask = imresize(mask, (oh, ow), "nearest")
        if short_size < self.crop_size:
            padh = max(self.crop_size - oh, 0)
            padw = max(self.crop_size - ow, 0)
            img = np.pad(img, ((0, padh), (0, padw), (0, 0)), constant_values=0)
            mask = np.pad(mask, ((0, padh), (0, padw)), constant_values=255)
        h, w = img.shape[0], img.shape[1]
        x1 = random.randint(0, w - self.crop_size)
        y1 = random.randint(0, h - self.crop_size)
        return {"image": img[y1:y1 + self.crop_size, x1:x1 + self.crop_size],
                "label": mask[y1:y1 + self.crop_size, x1:x1 + self.crop_size]}


class FixScaleCrop:
    """custom_transforms.py:138-166: short side -> crop_size, center crop."""

    def __init__(self, crop_size):
        self.crop_size = crop_size

    def __call__(self, sample):
        img = np.asarray(sample["image"])
        mask = np.asarray(sample["label"])
        h, w = img.shape[0], img.shape[1]
        oh, ow = _short_side_dims(w, h, self.crop_size)
        x1 = int(round((ow - self.crop_size) / 2.0))
        y1 = int(round((oh - self.crop_size) / 2.0))
        cs = self.crop_size
        img = _imresize_crop(img, oh, ow, x1, y1, cs, cs)
        mask = _imresize_crop(mask, oh, ow, x1, y1, cs, cs, "nearest")
        return {"image": img, "label": mask}


class FixScaleCropImageOnly:
    """custom_transforms.py:277-297."""

    def __init__(self, crop_size):
        self.crop_size = crop_size

    def __call__(self, img):
        img = np.asarray(img)
        h, w = img.shape[0], img.shape[1]
        oh, ow = _short_side_dims(w, h, self.crop_size)
        x1 = int(round((ow - self.crop_size) / 2.0))
        y1 = int(round((oh - self.crop_size) / 2.0))
        return _imresize_crop(img, oh, ow, x1, y1,
                              self.crop_size, self.crop_size)


class Scale:
    """custom_transforms.py:169-190: short side -> base_size, no crop."""

    def __init__(self, base_size):
        self.base_size = base_size

    def __call__(self, sample):
        img = np.asarray(sample["image"])
        mask = np.asarray(sample["label"])
        h, w = img.shape[0], img.shape[1]
        oh, ow = _short_side_dims(w, h, self.base_size)
        return {"image": imresize(img, (oh, ow)),
                "label": imresize(mask, (oh, ow), "nearest")}


class ScaleImageOnly:
    def __init__(self, base_size):
        self.base_size = base_size

    def __call__(self, img):
        img = np.asarray(img)
        h, w = img.shape[0], img.shape[1]
        oh, ow = _short_side_dims(w, h, self.base_size)
        return imresize(img, (oh, ow))


def _letterbox_dims(w: int, h: int, base_size: int) -> Tuple[int, int]:
    """ScaleWithPadding size rule (custom_transforms.py:227-236): long side
    -> base_size, short side even-rounded up."""
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
    return oh, ow


class ScaleWithPadding:
    """custom_transforms.py:214-245: letterbox into base_size^2; mask pad=255.

    Note the reference places the scaled content with integer-half offsets,
    reproduced exactly.
    """

    def __init__(self, base_size):
        self.base_size = base_size

    def __call__(self, sample):
        img = np.asarray(sample["image"])
        mask = np.asarray(sample["label"])
        h, w = img.shape[0], img.shape[1]
        out_image = np.zeros((self.base_size, self.base_size, 3), np.float32)
        out_mask = np.full((self.base_size, self.base_size), 255, np.uint8)
        oh, ow = _letterbox_dims(w, h, self.base_size)
        img = imresize(img, (oh, ow))
        mask = imresize(mask, (oh, ow), "nearest")
        b = self.base_size
        out_image[b // 2 - oh // 2: b // 2 + oh // 2,
                  b // 2 - ow // 2: b // 2 + ow // 2] = img
        out_mask[b // 2 - oh // 2: b // 2 + oh // 2,
                 b // 2 - ow // 2: b // 2 + ow // 2] = mask
        return {"image": out_image, "label": out_mask}


class ScaleWithPaddingImageOnly:
    """custom_transforms.py:248-274."""

    def __init__(self, base_size):
        self.base_size = base_size

    def __call__(self, img):
        img = np.asarray(img)
        h, w = img.shape[0], img.shape[1]
        out_image = np.zeros((self.base_size, self.base_size, 3), np.float32)
        oh, ow = _letterbox_dims(w, h, self.base_size)
        img = imresize(img, (oh, ow))
        b = self.base_size
        out_image[b // 2 - oh // 2: b // 2 + oh // 2,
                  b // 2 - ow // 2: b // 2 + ow // 2] = img
        return out_image


class FixedResize:
    """custom_transforms.py:345-360 (including its mask-from-image quirk)."""

    def __init__(self, size):
        self.size = (size, size)

    def __call__(self, sample):
        img = np.asarray(sample["image"])
        mask = np.asarray(sample["label"])
        assert img.shape[0] == mask.shape[0] and img.shape[1] == mask.shape[1]
        img = imresize(img, self.size)
        # NOTE: the reference resizes ``img`` into the label slot here
        # (custom_transforms.py:357) — kept verbatim since FixedResize is
        # unused by any driver; fixing it would silently change parity.
        mask = imresize(img, self.size, "nearest")
        return {"image": img, "label": mask}


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


def invert_fix_scale_crop(label: np.ndarray, output: np.ndarray,
                          region, crop_size: int) -> None:
    """custom_transforms.py:300-315: project a crop-space (r, c, h, w) box
    back to full-res label space and copy ground truth into ``output``."""
    h, w = label.shape
    oh, ow = _short_side_dims(w, h, crop_size)
    x1 = int(round((ow - crop_size) / 2.0))
    y1 = int(round((oh - crop_size) / 2.0))
    b0 = round((region[0] + y1) * (h / oh))
    b1 = round((region[1] + x1) * (w / ow))
    b2 = round(region[2] * (h / oh))
    b3 = round(region[3] * (w / ow))
    output[b0: b0 + b2, b1: b1 + b3] = label[b0: b0 + b2, b1: b1 + b3]


def invert_scale_crop(label: np.ndarray, output: np.ndarray,
                      region, base_size: int) -> None:
    """custom_transforms.py:318-342: letterbox-space box -> full-res copy."""
    h, w = label.shape
    oh, ow = _letterbox_dims(w, h, base_size)
    padding_h = abs(base_size - oh) // 2
    padding_w = abs(base_size - ow) // 2
    b0 = round(max(region[0] - padding_h, 0) * (h / oh))
    b1 = round(max(region[1] - padding_w, 0) * (w / ow))
    b2 = round(region[2] * (h / oh))
    b3 = round(region[3] * (w / ow))
    output[b0: b0 + b2, b1: b1 + b3] = label[b0: b0 + b2, b1: b1 + b3]
