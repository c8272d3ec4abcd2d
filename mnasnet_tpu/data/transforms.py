"""torchvision-parity image transforms (PIL-backed, host CPU).

The rebuild contract requires the input pipeline to "match torchvision
transform outputs bit-for-bit within fp tolerance" [B:north_star]. torchvision
is NOT installed in this env (SURVEY.md §0), so these are reimplementations of
the documented semantics (SURVEY.md §2.4), pinned by golden tests against the
documented behaviors:

  * Train: RandomResizedCrop(size, scale=(0.08,1.0), ratio=(3/4,4/3),
    bilinear) → RandomHorizontalFlip(0.5) → ToTensor → Normalize.
  * Val:   Resize(shorter→256, bilinear) → CenterCrop(224) → ToTensor →
    Normalize.

Parity gotchas encoded here (SURVEY.md §2.4): PIL antialiased bilinear resize;
RandomResizedCrop falls back to a ratio-clamped center crop after 10 failed
draws; Resize preserves aspect with round(); normalisation in float32 before
any bf16 cast. Output is NHWC float32 (TPU layout) — the reference's CHW is a
torch-ism we do not copy.
"""

from __future__ import annotations

import math

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_BILINEAR = Image.Resampling.BILINEAR


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    """torchvision ``Resize(int)``: scale so the shorter side == size,
    preserving aspect ratio (other side truncated, torchvision semantics)."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        ow, oh = size, int(size * h / w)  # torchvision truncates, not rounds
    else:
        ow, oh = int(size * w / h), size
    return img.resize((ow, oh), _BILINEAR)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    """torchvision ``CenterCrop``: pads with zeros if the image is smaller."""
    w, h = img.size
    if w < size or h < size:
        padded = Image.new(img.mode, (max(w, size), max(h, size)))
        padded.paste(img, ((max(w, size) - w) // 2, (max(h, size) - h) // 2))
        img, (w, h) = padded, padded.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def random_resized_crop_params(
    rng: np.random.Generator,
    width: int,
    height: int,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> tuple[int, int, int, int]:
    """Sample (top, left, h, w) with torchvision's algorithm: 10 attempts of
    area∈scale·A, log-uniform aspect∈ratio; then the documented center-crop
    fallback clamped to the ratio range."""
    area = float(width * height)
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # Fallback: center crop at the closest in-range aspect ratio.
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def random_resized_crop(
    img: Image.Image,
    size: int,
    rng: np.random.Generator,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Image.Image:
    top, left, h, w = random_resized_crop_params(rng, *img.size, scale, ratio)
    # crop THEN resize (torchvision resized_crop semantics). A single
    # resize(box=...) call is NOT equivalent: PIL clamps the filter support
    # to the full image, so out-of-box pixels bleed into the edge rows/cols
    # (up to 32/255 off vs the torch tensor-backend oracle — caught by
    # tests/test_transform_torch_parity.py; crop-then-resize agrees ≤1/255).
    return img.crop((left, top, left + w, top + h)).resize(
        (size, size), _BILINEAR
    )


def to_float_array(img: Image.Image) -> np.ndarray:
    """ToTensor semantics minus the torch CHW-ism: uint8 HWC → float32 HWC in
    [0,1]. NHWC is the TPU-native layout."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def normalize(arr: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """Channel-wise normalize in float32 (before any bf16 cast)."""
    return (arr - mean) / std


def train_transform(
    img: Image.Image, size: int, rng: np.random.Generator
) -> np.ndarray:
    img = random_resized_crop(img, size, rng)
    if rng.random() < 0.5:
        img = img.transpose(Image.Transpose.FLIP_LEFT_RIGHT)
    return normalize(to_float_array(img))


def eval_transform(
    img: Image.Image, size: int = 224, resize_size: int | None = None
) -> np.ndarray:
    if resize_size is None:
        # torchvision convention: resize to size·256/224 (=256 for 224 crops).
        resize_size = int(round(size * 256 / 224))
    img = resize_shorter(img, resize_size)
    img = center_crop(img, size)
    return normalize(to_float_array(img))
