#!/usr/bin/env python
"""(Re)generate tests/golden/transforms_golden.npz — the SELF-generated
regression pin for the transform stack (tests/test_transform_golden.py).

These arrays are produced by the code under test, so they pin regressions
only; the two-sided parity evidence lives in transforms_torch.npz
(tools/gen_torch_goldens.py). Preserves the original source image so both
npz files stay comparable across regenerations.

Run after any INTENDED transform-semantics change and commit the npz:
    python tools/gen_self_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mnasnet_tpu.data.transforms import eval_transform, train_transform  # noqa: E402

PATH = os.path.join(REPO, "tests", "golden", "transforms_golden.npz")


def main():
    with np.load(PATH) as z:
        image = z["image"]
    img = Image.fromarray(image)
    out = {
        "image": image,
        "eval_224": eval_transform(img, 224),
        "eval_160": eval_transform(img, 160),
        "train_224_seed7": train_transform(img, 224, np.random.default_rng(7)),
        "train_96_seed3": train_transform(img, 96, np.random.default_rng(3)),
    }
    np.savez_compressed(PATH, **out)
    print(f"rewrote {PATH}: {sorted(out)}")


if __name__ == "__main__":
    main()
