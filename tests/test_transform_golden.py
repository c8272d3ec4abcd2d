"""Golden-array transform pinning (SURVEY.md §4.2): outputs of the
torchvision-semantics transforms are stored in the repo; any change to
resampling/crop/normalize code that shifts results breaks these."""

import os

import numpy as np
import pytest
from PIL import Image

from mnasnet_tpu.data.transforms import eval_transform, train_transform

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "transforms_golden.npz")


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


def test_eval_golden(golden):
    img = Image.fromarray(golden["image"])
    np.testing.assert_allclose(eval_transform(img, 224), golden["eval_224"],
                               atol=1e-6)
    np.testing.assert_allclose(eval_transform(img, 160), golden["eval_160"],
                               atol=1e-6)


def test_train_golden(golden):
    img = Image.fromarray(golden["image"])
    np.testing.assert_allclose(
        train_transform(img, 224, np.random.default_rng(7)),
        golden["train_224_seed7"], atol=1e-6,
    )
    np.testing.assert_allclose(
        train_transform(img, 96, np.random.default_rng(3)),
        golden["train_96_seed3"], atol=1e-6,
    )


def test_native_decoder_matches_golden(golden):
    native = pytest.importorskip("mnasnet_tpu.data.native_decoder")
    if not native.available():
        pytest.skip("native decoder unavailable")
    import io

    buf = io.BytesIO()
    Image.fromarray(golden["image"]).save(buf, format="JPEG", quality=98)
    jpeg = buf.getvalue()
    out = native.decode_eval(jpeg, 224, fast=False)
    # compare against PIL on the SAME jpeg (isolates resampling from JPEG
    # round-trip loss): fixed-point-vs-float resampling only, ≤2/255 px
    ref = eval_transform(Image.open(io.BytesIO(jpeg)), 224)
    from mnasnet_tpu.data.transforms import IMAGENET_STD

    diff_px = np.abs(out - ref) * IMAGENET_STD * 255.0
    assert float(diff_px.max()) <= 2.0
