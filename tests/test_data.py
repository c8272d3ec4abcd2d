"""Data pipeline tests: sharding invariants (SURVEY.md §4.3), static-shape
batching with masked padding, ImageFolder layout, transform golden behaviors
(SURVEY.md §4.2)."""

import numpy as np
import pytest
from PIL import Image

from mnasnet_tpu.data.dataset import (
    ImageFolderDataset,
    SyntheticDataset,
    shard_indices,
)
from mnasnet_tpu.data.pipeline import DataLoader
from mnasnet_tpu.data.transforms import (
    center_crop,
    eval_transform,
    normalize,
    random_resized_crop_params,
    resize_shorter,
    to_float_array,
    train_transform,
)


# --------------------------------------------------------------- sharding
def test_every_sample_seen_exactly_once_across_shards():
    n, shards = 103, 4
    seen = []
    for s in range(shards):
        seen.extend(
            shard_indices(n, epoch=3, shuffle=True, seed=5, shard_id=s,
                          num_shards=shards, drop_last=False).tolist()
        )
    # padded to equal shard lengths: every index present, dup count == pad
    assert set(seen) == set(range(n))
    assert len(seen) == -(-n // shards) * shards


def test_drop_last_sharding_no_duplicates():
    n, shards = 103, 4
    seen = []
    for s in range(shards):
        seen.extend(
            shard_indices(n, epoch=0, shuffle=True, seed=5, shard_id=s,
                          num_shards=shards, drop_last=True).tolist()
        )
    assert len(seen) == len(set(seen)) == (n // shards) * shards


def test_shuffle_differs_by_epoch_same_across_shards():
    a = shard_indices(64, 0, shuffle=True, seed=1, shard_id=0, num_shards=1,
                      drop_last=True)
    b = shard_indices(64, 1, shuffle=True, seed=1, shard_id=0, num_shards=1,
                      drop_last=True)
    assert not np.array_equal(a, b)
    # same (seed, epoch) ⇒ same permutation (multi-host determinism)
    c = shard_indices(64, 0, shuffle=True, seed=1, shard_id=0, num_shards=1,
                      drop_last=True)
    assert np.array_equal(a, c)


# --------------------------------------------------------------- loader
def _tiny_transform(img):
    return to_float_array(img)[:8, :8]


def test_loader_pads_tail_with_negative_labels():
    ds = SyntheticDataset(length=10, image_size=8, num_classes=5)
    dl = DataLoader(ds, batch_size=4, transform=_tiny_transform, workers=0,
                    augment=False)
    batches = list(dl.epoch(0))
    assert len(batches) == 3
    images, labels = batches[-1]
    assert images.shape == (4, 8, 8, 3)
    assert (labels[2:] == -1).all() and (labels[:2] >= 0).all()


def test_loader_threaded_equals_serial():
    ds = SyntheticDataset(length=16, image_size=8, num_classes=5)
    kw = dict(batch_size=4, transform=_tiny_transform, augment=False,
              shuffle=True, seed=3)
    serial = list(DataLoader(ds, workers=0, **kw).epoch(1))
    threaded = list(DataLoader(ds, workers=3, **kw).epoch(1))
    for (si, sl), (ti, tl) in zip(serial, threaded):
        np.testing.assert_array_equal(si, ti)
        np.testing.assert_array_equal(sl, tl)


def test_consumed_log_records_yielded_batches(tmp_path, monkeypatch):
    """MNASNET_TPU_CONSUMED_LOG captures exactly the yielded batches with
    their pre-padding indices + n_valid — the hook tools/multihost_data.py
    uses to prove the per-host sampler contract on real data."""
    import json

    log = tmp_path / "consumed.jsonl"
    monkeypatch.setenv("MNASNET_TPU_CONSUMED_LOG", str(log))
    ds = SyntheticDataset(length=10, image_size=8, num_classes=5)
    for workers in (0, 2):
        log.write_text("")
        dl = DataLoader(ds, batch_size=4, transform=_tiny_transform,
                        workers=workers, augment=False)
        n_batches = len(list(dl.epoch(2)))
        recs = [json.loads(line) for line in log.read_text().splitlines()]
        assert len(recs) == n_batches == 3
        assert all(r["epoch"] == 2 and r["n"] == 10 for r in recs)
        valid = [i for r in recs
                 for i in r["indices"][: r["n_valid"] or len(r["indices"])]]
        assert sorted(valid) == list(range(10))
        assert recs[-1]["n_valid"] == 2 and recs[0]["n_valid"] is None


def test_imagefolder_layout(tmp_path):
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                np.zeros((10, 10, 3), np.uint8)
            ).save(d / f"{i}.jpg")
    ds = ImageFolderDataset(str(tmp_path))
    assert ds.classes == ["cat", "dog"]
    assert len(ds) == 6
    img, label = ds.load(0)
    assert label == 0 and img.size == (10, 10)


# --------------------------------------------------------------- transforms
def test_resize_shorter_preserves_aspect():
    img = Image.new("RGB", (400, 300))
    out = resize_shorter(img, 256)
    assert out.size == (int(round(256 * 400 / 300)), 256)
    # no-op when shorter side already == size
    assert resize_shorter(Image.new("RGB", (300, 256)), 256).size == (300, 256)


def test_center_crop_coords():
    img = Image.fromarray(
        np.arange(300 * 400 * 3, dtype=np.uint8).reshape(300, 400, 3) % 255
    )
    out = center_crop(img, 224)
    ref = np.asarray(img)[38:262, 88:312]  # round((300-224)/2)=38, (400-224)/2=88
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_normalize_values():
    arr = np.ones((2, 2, 3), np.float32)
    out = normalize(arr)
    expect = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], expect.astype(np.float32), rtol=1e-6)


def test_rrc_params_in_bounds_and_deterministic():
    rng1 = np.random.default_rng(0)
    rng2 = np.random.default_rng(0)
    for _ in range(50):
        t, l, h, w = random_resized_crop_params(rng1, 200, 150)
        assert 0 <= t and t + h <= 150 and 0 <= l and l + w <= 200
        assert (t, l, h, w) == random_resized_crop_params(rng2, 200, 150)


def test_rrc_fallback_extreme_aspect():
    # 1000x10 image: all 10 attempts fail → documented center-crop fallback
    rng = np.random.default_rng(0)
    t, l, h, w = random_resized_crop_params(rng, 1000, 10)
    assert h == 10 and w == int(round(10 * 4.0 / 3.0))


def test_eval_transform_shape_dtype():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 500, 3), dtype=np.uint8)
    )
    out = eval_transform(img, 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    out160 = eval_transform(img, 160)  # resolution grid support
    assert out160.shape == (160, 160, 3)


def test_train_transform_deterministic_given_rng():
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (128, 128, 3), dtype=np.uint8)
    )
    a = train_transform(img, 64, np.random.default_rng(42))
    b = train_transform(img, 64, np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 64, 3)


def test_loader_native_bytes_path(tmp_path):
    # DataLoader routes JPEGs through bytes_transform, matching the PIL path.
    pytest.importorskip("mnasnet_tpu.data.native_decoder")
    from mnasnet_tpu.data import native_decoder

    if not native_decoder.available():
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (280, 320, 3), dtype=np.uint8)
            ).save(d / f"{i}.jpg", quality=95)
    ds = ImageFolderDataset(str(tmp_path))
    kw = dict(batch_size=3, shuffle=False, drop_last=True, workers=0,
              augment=False)
    pil = DataLoader(ds, transform=lambda img: eval_transform(img, 64), **kw)
    nat = DataLoader(
        ds, transform=lambda img: eval_transform(img, 64),
        bytes_transform=lambda data: native_decoder.decode_eval(data, 64, fast=False),
        **kw,
    )
    (pi, pl_), (ni, nl) = next(iter(pil.epoch(0))), next(iter(nat.epoch(0)))
    np.testing.assert_array_equal(pl_, nl)
    assert float(np.abs(pi - ni).max()) < 0.05  # ~2/255 in normalized units


# --------------------------------------------------------------- robustness
def test_prefetch_propagates_loader_exception():
    """A loader failure must surface in the training loop, not end the epoch
    silently (ADVICE r1: silent epoch truncation)."""
    from mnasnet_tpu.data.pipeline import prefetch_to_device

    def gen():
        yield (np.zeros((2, 8, 8, 3), np.float32), np.zeros((2,), np.int32))
        raise ValueError("corrupt JPEG")

    it = prefetch_to_device(gen())
    next(it)
    with pytest.raises(ValueError, match="corrupt JPEG"):
        next(it)


def test_prefetch_early_exit_stops_producer():
    """Breaking out of the epoch mid-way must unblock and stop the producer
    thread (no leaked thread holding loader resources)."""
    import threading

    from mnasnet_tpu.data.pipeline import prefetch_to_device

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield (np.zeros((1, 4, 4, 3), np.float32), np.zeros((1,), np.int32))

    before = threading.active_count()
    it = prefetch_to_device(gen(), size=2)
    next(it)
    it.close()  # consumer abandons the epoch
    # producer must stop promptly (bounded by its 0.1s put timeout)
    deadline = __import__("time").time() + 5.0
    while threading.active_count() > before and __import__("time").time() < deadline:
        __import__("time").sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 100, "producer should not have drained the epoch"


def test_loader_falls_back_to_pil_on_bytes_failure():
    """Per-image PIL fallback when the native bytes path rejects a JPEG
    (e.g. CMYK) — ADVICE r1."""

    class BytesDataset:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def load_bytes(self, index):
            return b"not a jpeg", index % 3

        def load(self, index):
            return Image.fromarray(
                np.full((8, 8, 3), index, np.uint8)
            ), index % 3

    def bad_bytes_transform(data):
        raise ValueError("corrupt JPEG")

    dl = DataLoader(
        BytesDataset(4), batch_size=4, transform=_tiny_transform,
        workers=0, augment=False, bytes_transform=bad_bytes_transform,
    )
    images, labels = next(iter(dl.epoch(0)))
    assert images.shape == (4, 8, 8, 3)
    np.testing.assert_array_equal(labels, [0, 1, 2, 0])
    # pixels prove the PIL path ran (index-valued images, /255 then normalized)
    assert not np.isnan(images).any()
