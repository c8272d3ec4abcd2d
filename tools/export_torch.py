#!/usr/bin/env python
"""Export an orbax checkpoint back to a torchvision-layout state_dict.

The reverse-migration path ([B:north_star] requires the forward direction;
this completes the round trip): weights trained here load straight into
torchvision's ``mnasnet*`` constructors — e.g. for mobile/Pixel serving,
which is what the MnasNet paper's latency metric targets.

Usage:
    python tools/export_torch.py --resume CKPT_DIR --arch mnasnet1_0 \
        --out model.pth [--best] [--use-ema]

``--use-ema`` exports the --model-ema weight moving average instead of the
raw weights (the TF recipe's serving weights).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resume", required=True, help="orbax checkpoint dir")
    p.add_argument("-a", "--arch", default="mnasnet1_0")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--best", action="store_true",
                   help="export the best-acc1 checkpoint")
    p.add_argument("--use-ema", action="store_true",
                   help="export the --model-ema weight moving average")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host-side conversion

    import torch

    from mnasnet_tpu import create_model
    from mnasnet_tpu.convert.torch_converter import flax_to_torch
    from mnasnet_tpu.train.checkpoint import CheckpointManager

    model = create_model(args.arch)
    mgr = CheckpointManager(os.path.abspath(args.resume))
    variables, epoch, best_acc1 = mgr.restore_variables(
        best=args.best, use_ema=args.use_ema
    )
    mgr.close()
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in flax_to_torch(variables, model.alpha).items()
    }
    torch.save({"state_dict": sd, "arch": args.arch, "epoch": epoch,
                "best_acc1": best_acc1}, args.out)
    n = sum(v.numel() for v in sd.values())
    print(f"wrote {args.out}: {len(sd)} tensors, {n:,} scalars "
          f"(epoch {epoch}, best_acc1 {best_acc1:.3f}"
          f"{', EMA weights' if args.use_ema else ''})")


if __name__ == "__main__":
    main()
