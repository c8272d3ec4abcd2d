"""Torch-side transform oracle (VERDICT r2 item 10 / SURVEY.md §4.2).

An INDEPENDENT implementation of the torchvision transform semantics,
executed under installed torch (CPU) with torch's own resampler
(``F.interpolate(..., antialias=True)`` — the torchvision *tensor* backend's
resize, a separate fixed-point-free code path from PIL's C resampling that
``mnasnet_tpu.data.transforms`` uses). Agreement between the two backends
within the documented torchvision PIL↔tensor tolerance (≈1e-2 in [0,1] pixel
space, i.e. ~2.5/255) is two-sided parity evidence: neither implementation
generated the other's expected values.

Everything here is deliberately torch-native — float32 CHW tensors,
torch normalize arithmetic — and never imports mnasnet_tpu.

Geometry helpers (shorter-side scale, center-crop box) follow the
torchvision-documented formulas (truncation / round-half-up); they are pure
integer arithmetic with one correct answer, so "independent" means
re-derived from the spec, not different.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

MEAN = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
STD = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)


def _to_chw_float(arr: np.ndarray) -> torch.Tensor:
    """uint8 HWC → float32 CHW in [0,1] (ToTensor semantics)."""
    return torch.from_numpy(np.ascontiguousarray(arr)).permute(2, 0, 1).float() / 255.0


def _resize(x: torch.Tensor, oh: int, ow: int) -> torch.Tensor:
    return F.interpolate(
        x.unsqueeze(0), size=(oh, ow), mode="bilinear",
        align_corners=False, antialias=True,
    ).squeeze(0)


def _shorter_side_dims(w: int, h: int, size: int) -> tuple[int, int]:
    """torchvision Resize(int): shorter side → size, other side TRUNCATED."""
    if w < h:
        return size, int(size * h / w)
    return int(size * w / h), size


def eval_transform_torch(arr: np.ndarray, size: int = 224,
                         resize_size: int | None = None) -> np.ndarray:
    """Resize(shorter→resize_size) → CenterCrop(size) → Normalize, all in
    torch. Returns float32 HWC (the repo's NHWC layout) for comparison."""
    if resize_size is None:
        resize_size = int(round(size * 256 / 224))
    h, w = arr.shape[:2]
    x = _to_chw_float(arr)
    if not ((w <= h and w == resize_size) or (h <= w and h == resize_size)):
        ow, oh = _shorter_side_dims(w, h, resize_size)
        x = _resize(x, oh, ow)
    _, H, W = x.shape
    if W < size or H < size:  # zero-pad smaller images (CenterCrop contract)
        pw, ph = max(W, size), max(H, size)
        canvas = torch.zeros(3, ph, pw)
        t0, l0 = (ph - H) // 2, (pw - W) // 2
        canvas[:, t0:t0 + H, l0:l0 + W] = x
        x, H, W = canvas, ph, pw
    top = int(round((H - size) / 2.0))
    left = int(round((W - size) / 2.0))
    x = x[:, top:top + size, left:left + size]
    x = (x - MEAN) / STD
    return x.permute(1, 2, 0).contiguous().numpy()


def resized_crop_torch(arr: np.ndarray, top: int, left: int, h: int, w: int,
                       size: int, flip: bool) -> np.ndarray:
    """RandomResizedCrop's pixel path for GIVEN params: crop the raw array,
    torch-resize to (size,size), optional horizontal flip, normalize.
    Param sampling is shared with the implementation under test (same rng
    stream); the pixels are computed independently."""
    crop = arr[top:top + h, left:left + w]
    x = _resize(_to_chw_float(crop), size, size)
    if flip:
        x = torch.flip(x, dims=(2,))
    x = (x - MEAN) / STD
    return x.permute(1, 2, 0).contiguous().numpy()
