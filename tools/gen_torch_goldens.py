#!/usr/bin/env python
"""Generate tests/golden/transforms_torch.npz — the TORCH-SIDE transform
goldens (VERDICT r2 item 10).

Unlike tests/golden/transforms_golden.npz (produced by the code under test,
a regression pin), these arrays are produced by tests/torch_ref_transforms.py
— an independent torch-tensor-backend implementation — so the parity test in
tests/test_transform_torch_parity.py is two-sided.

Uses the SAME source image as the existing golden npz (comparability).
Run once and commit the npz: python tools/gen_torch_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from torch_ref_transforms import eval_transform_torch, resized_crop_torch  # noqa: E402
from mnasnet_tpu.data.transforms import random_resized_crop_params  # noqa: E402

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def main():
    with np.load(os.path.join(GOLDEN_DIR, "transforms_golden.npz")) as z:
        image = z["image"]

    out = {"image": image}
    out["eval_224"] = eval_transform_torch(image, 224)
    out["eval_160"] = eval_transform_torch(image, 160)
    # small-image path: downscale the source so CenterCrop must zero-pad
    small = image[:100, :80]
    out["small_image"] = small
    out["eval_small_224"] = eval_transform_torch(small, 224)

    # train pixel path: params sampled once (shared stream — geometry is
    # identical by construction; the PIXELS are computed independently),
    # stored alongside so the test replays the exact same boxes.
    h, w = image.shape[:2]
    for seed in (3, 7, 11):
        rng = np.random.default_rng(seed)
        top, left, ch, cw = random_resized_crop_params(rng, w, h)
        flip = bool(rng.random() < 0.5)
        out[f"rrc_params_{seed}"] = np.array([top, left, ch, cw, int(flip)])
        out[f"rrc_{seed}"] = resized_crop_torch(
            image, top, left, ch, cw, 224, flip
        )

    path = os.path.join(GOLDEN_DIR, "transforms_torch.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {sorted(out)}")


if __name__ == "__main__":
    main()
