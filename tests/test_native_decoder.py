"""Native fused decoder vs the PIL reference pipeline (SURVEY.md §2.3 N8/N9).

Strict mode (fast=False) must match the PIL transforms within fixed-point
tolerance (PIL resamples in int16 fixed point; the native path uses float —
≤2/255 per channel after normalization inversion). Fast mode (DCT-scaled
decode) is approximate by design; checked loosely.
"""

import io

import numpy as np
import pytest
from PIL import Image

from mnasnet_tpu.data import eval_transform, train_transform
from mnasnet_tpu.data.transforms import IMAGENET_STD

native = pytest.importorskip("mnasnet_tpu.data.native_decoder")

if not native.available():
    pytest.skip("native decoder build unavailable", allow_module_level=True)


def _jpeg(w=500, h=375, seed=0, quality=92):
    rng = np.random.default_rng(seed)
    # smooth-ish content so JPEG round-trip noise stays small
    base = rng.standard_normal((h // 25 + 1, w // 25 + 1, 3))
    img = np.kron(base, np.ones((25, 25, 1)))[:h, :w]
    img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _maxdiff_px(a, b):
    # difference in 0-255 pixel units (undo the normalize scaling)
    return float(np.max(np.abs(a - b) * IMAGENET_STD * 255.0))


def test_jpeg_dims():
    assert native.jpeg_dims(_jpeg(500, 375)) == (500, 375)


def test_eval_matches_pil_strict():
    jpeg = _jpeg()
    ours = native.decode_eval(jpeg, 224, fast=False)
    ref = eval_transform(Image.open(io.BytesIO(jpeg)), 224)
    assert ours.shape == ref.shape == (224, 224, 3)
    assert _maxdiff_px(ours, ref) <= 2.0


def test_eval_fast_close():
    jpeg = _jpeg(1000, 750)
    ours = native.decode_eval(jpeg, 224, fast=True)
    ref = eval_transform(Image.open(io.BytesIO(jpeg)), 224)
    # DCT-scaled decode is an approximation of full-decode-then-resize:
    # high-frequency content differs at block edges, so check agreement
    # distributionally rather than per-pixel.
    diff_px = np.abs(ours - ref) * IMAGENET_STD * 255.0
    assert float(np.median(diff_px)) <= 4.0
    assert float(np.percentile(diff_px, 90)) <= 20.0
    assert abs(float(ours.mean() - ref.mean())) < 0.02
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98


def test_train_matches_pil_strict():
    jpeg = _jpeg(640, 480, seed=3)
    img = Image.open(io.BytesIO(jpeg))
    for seed in range(4):
        ours = native.decode_train(jpeg, 224, np.random.default_rng(seed),
                                   fast=False)
        ref = train_transform(img, 224, np.random.default_rng(seed))
        assert ours.shape == ref.shape
        assert _maxdiff_px(ours, ref) <= 2.0, seed


def test_corrupt_jpeg_raises():
    with pytest.raises(ValueError):
        native.decode_eval(b"\xff\xd8\x00garbage", 224)


def test_small_image_upscales_like_pil():
    # Resize(256) UPSCALES a small image before the crop — same as PIL.
    jpeg = _jpeg(100, 80, seed=5)
    ours = native.decode_eval(jpeg, 224, fast=False)
    ref = eval_transform(Image.open(io.BytesIO(jpeg)), 224)
    assert _maxdiff_px(ours, ref) <= 2.0


def test_tiny_resize_target_rejected():
    jpeg = _jpeg(500, 375)
    with pytest.raises(ValueError):
        native.decode_eval(jpeg, 224, resize_size=100, fast=False)


def _build_and_decode(repo_dir, jpeg, q):
    # spawn-target (module level: must be picklable)
    from mnasnet_tpu.data import native_decoder as nd
    nd._SRC = str(repo_dir / "native" / "fused_decoder.cpp")
    nd._LIB = str(repo_dir / "native" / "libfuseddec.so")
    nd._lib = None
    try:
        out = nd.decode_eval(jpeg, 64, fast=False)
        q.put(("ok", out.shape))
    except Exception as e:  # surfaced in the parent assert
        q.put(("err", repr(e)))


def test_concurrent_fresh_build(tmp_path):
    """Two processes racing to build the .so from a fresh checkout must both
    succeed (fcntl file lock + atomic rename — VERDICT r2 weak #7)."""
    import multiprocessing as mp
    import shutil

    repo = tmp_path / "checkout"
    (repo / "native").mkdir(parents=True)
    shutil.copy(native._SRC, repo / "native" / "fused_decoder.cpp")

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    jpeg = _jpeg(200, 150)
    procs = [
        ctx.Process(target=_build_and_decode, args=(repo, jpeg, q))
        for _ in range(2)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
    assert all(r == ("ok", (64, 64, 3)) for r in results), results
