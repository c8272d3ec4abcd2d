"""Edge-case property tests for the torchvision-semantics transforms
(SURVEY.md §2.4 parity gotchas; VERDICT r1 item 7).

The golden tests pin whole-pipeline outputs; these pin the branchy logic —
RandomResizedCrop's 10-attempt fallback at the exact ratio bounds, the
resize_shorter equal-side short-circuit and truncation, and the CenterCrop
pad path for tiny images — where an off-by-one diverges from torchvision
without moving the goldens.
"""

import numpy as np
import pytest
from PIL import Image

from mnasnet_tpu.data.transforms import (
    center_crop,
    eval_transform,
    random_resized_crop_params,
    resize_shorter,
)


def _img(w, h, value=128):
    return Image.fromarray(np.full((h, w, 3), value, dtype=np.uint8))


class _FixedRng:
    """Duck-typed rng whose uniform() always returns the interval endpoint
    selected by `hi`, forcing deterministic RRC attempt outcomes."""

    def __init__(self, hi=True):
        self.hi = hi

    def uniform(self, lo, hi):
        return hi if self.hi else lo

    def integers(self, lo, hi):
        return lo

    def random(self):
        return 0.0


# ---------------------------------------------------------------- resize ---


def test_resize_shorter_noop_when_shorter_side_matches():
    # torchvision short-circuits (returns the input unchanged) when the
    # shorter side already equals the target — no resample, bit-identical.
    img = _img(256, 400)
    assert resize_shorter(img, 256) is img
    img = _img(400, 256)
    assert resize_shorter(img, 256) is img
    img = _img(256, 256)
    assert resize_shorter(img, 256) is img


def test_resize_shorter_still_resizes_when_longer_side_matches():
    # w == size but w is the LONGER side → must still resize (h' = 256).
    img = _img(256, 100)
    out = resize_shorter(img, 256)
    assert out.size == (int(256 * 256 / 100), 256)


def test_resize_shorter_truncates_not_rounds():
    # 500x375 → shorter 375 → scale 256/375; 500*256/375 = 341.33 → 341
    # (torchvision int()-truncates; round() would give 341 here, so also
    # check a case where they differ: 640x480 → 640*256/480 = 341.33 → 341;
    # 427x240 → 427*256/240 = 455.46 → 455 either way; use 15x10 → 256*15/10
    # = 384 exact; need fractional .5+: 301x200 → 385.28 → 385. Use .5+ case
    # 399x200 → 510.72 → 510, round gives 511.)
    out = resize_shorter(_img(500, 375), 256)
    assert out.size == (341, 256)
    out = resize_shorter(_img(399, 200), 256)
    assert out.size == (int(399 * 256 / 200), 256)
    assert out.size[0] == 510  # truncated, not rounded (510.72)


def test_eval_transform_resize_size_convention():
    # resize target scales with crop size: 160 → round(160*256/224) = 183.
    out = eval_transform(_img(300, 200), 160)
    assert out.shape == (160, 160, 3)
    out = eval_transform(_img(300, 200), 224)
    assert out.shape == (224, 224, 3)


# ------------------------------------------------------------ center crop ---


def test_center_crop_pads_small_images_with_zeros():
    img = _img(100, 100, value=200)
    out = center_crop(img, 224)
    assert out.size == (224, 224)
    arr = np.asarray(out)
    # original pasted centered: (224-100)//2 = 62
    assert (arr[62:162, 62:162] == 200).all()
    assert (arr[:62] == 0).all() and (arr[162 + 62:] == 0).all()
    assert (arr[:, :62] == 0).all()


def test_center_crop_pads_single_small_dim():
    img = _img(300, 100, value=50)
    out = center_crop(img, 224)
    assert out.size == (224, 224)
    arr = np.asarray(out)
    pad_top = (224 - 100) // 2
    assert (arr[pad_top:pad_top + 100] == 50).all()
    assert (arr[:pad_top] == 0).all()


def test_center_crop_rounds_half_offsets_like_torchvision():
    # odd margin: (225-224)/2 = 0.5 → round() = 0 (banker's rounding of
    # Python round(0.5)=0 matches torchvision's int(round(...)) behavior)
    arr = np.zeros((225, 225, 3), np.uint8)
    arr[0, 0] = 255
    out = center_crop(Image.fromarray(arr), 224)
    assert np.asarray(out)[0, 0, 0] == 255  # top-left kept → offset was 0


# ------------------------------------------------- RRC fallback semantics ---


def test_rrc_fallback_wide_image_clamps_to_max_ratio():
    # 1000x10: every attempt needs h ≥ ~24 > 10 → all 10 fail → fallback.
    # in_ratio = 100 > 4/3 → h = height, w = round(h * 4/3), centered.
    top, left, h, w = random_resized_crop_params(
        np.random.default_rng(0), 1000, 10
    )
    assert (h, w) == (10, 13)
    assert top == 0 and left == (1000 - 13) // 2


def test_rrc_fallback_tall_image_clamps_to_min_ratio():
    # 10x1000: in_ratio = 0.01 < 3/4 → w = width, h = round(w / 0.75).
    top, left, h, w = random_resized_crop_params(
        np.random.default_rng(0), 10, 1000
    )
    assert (w, h) == (10, 13)
    assert left == 0 and top == (1000 - 13) // 2


def test_rrc_fallback_in_range_ratio_takes_whole_image():
    # Force all attempts to fail on a square image by pinning uniform() to
    # the hi endpoint: scale=1.0, aspect=4/3 → w = round(sqrt(A·4/3)) > width.
    top, left, h, w = random_resized_crop_params(_FixedRng(hi=True), 100, 100)
    assert (top, left, h, w) == (0, 0, 100, 100)


def test_rrc_fallback_at_exact_ratio_bounds():
    # in_ratio exactly 3/4 and exactly 4/3 must take the else branch
    # (whole image), not the clamp branches — torchvision uses strict <,>.
    top, left, h, w = random_resized_crop_params(_FixedRng(hi=True), 30, 40)
    assert (h, w) == (40, 30)  # in_ratio = 0.75 → full image
    top, left, h, w = random_resized_crop_params(_FixedRng(hi=True), 40, 30)
    assert (h, w) == (30, 40)  # in_ratio = 4/3 → full image


def test_rrc_attempt_succeeds_at_exact_full_area():
    # lo endpoint: scale=0.08·A... use hi scale with aspect=1 image: square
    # 128²; FixedRng(hi) fails (aspect 4/3). Pin aspect to lo (3/4):
    class R(_FixedRng):
        def uniform(self, lo, hi):
            # scale draw happens on (scale[0], scale[1]) = (0.08, 1.0);
            # ratio draw on (log 3/4, log 4/3) — distinguish by sign of lo.
            return hi if lo > 0 else lo

    top, left, h, w = random_resized_crop_params(R(), 128, 128)
    # target_area = A, aspect = 3/4 → w = round(sqrt(A·3/4)) = 111,
    # h = round(sqrt(A/0.75)) = 148 > 128 → fails; attempt loop then falls
    # back (in-range square) → whole image. Verifies the boundary w<=width
    # test uses <=, not <.
    assert (top, left, h, w) == (0, 0, 128, 128)


def test_rrc_boundary_w_equals_width_is_valid():
    # An attempt producing exactly w == width must be accepted (<=, not <).
    class R:
        def __init__(self):
            self.calls = 0

        def uniform(self, lo, hi):
            # scale=1.0 (full area), aspect=1.0 (log-uniform midpoint 0)
            return 1.0 if lo > 0 else 0.0

        def integers(self, lo, hi):
            assert hi == 1  # only offset 0 possible when crop spans fully
            return 0

    top, left, h, w = random_resized_crop_params(R(), 64, 64)
    assert (top, left, h, w) == (0, 0, 64, 64)


def test_rrc_params_always_in_bounds():
    rng = np.random.default_rng(42)
    for _ in range(200):
        W = int(rng.integers(1, 512))
        H = int(rng.integers(1, 512))
        top, left, h, w = random_resized_crop_params(rng, W, H)
        assert 0 <= top and 0 <= left
        assert h >= 1 and w >= 1
        assert top + h <= H or h == H  # fallback may clamp to full side
        assert left + w <= W or w == W
