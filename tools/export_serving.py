#!/usr/bin/env python
"""Serving export: model + weights → a portable StableHLO artifact.

The reference lineage's deployment path serialized the traced graph
(TorchScript / ONNX export of the trained module). The TPU-native analogue
is ``jax.export``: the eval-mode forward is traced once, lowered to
StableHLO with the trained weights baked in as constants, and serialized to
a single file that reloads and executes WITHOUT any of this package's
Python model code — exactly what a serving fleet wants to ship. The
artifact is multi-platform: lowered for both TPU and CPU by default, so the
same file serves on-chip and in CPU canaries.

Weight sources mirror eval.py: ``--resume`` (orbax checkpoint, optionally
``--use-ema`` / ``--best``), ``--pretrained`` (a torch state_dict converted
on the fly), or random init (``--random-init``, smoke/benchmarking only).

Usage:
  python tools/export_serving.py --arch mnasnet1_0 --resume RUN_DIR \
      --image-size 224 --batch-size 8 --dtype bfloat16 --out model.shlo
  python tools/export_serving.py --verify model.shlo --arch mnasnet1_0 \
      --resume RUN_DIR            # reload, run, compare vs live forward

The serialized call contract is ``f(images) -> logits`` with images
``float32 [batch, size, size, 3]`` already normalized (the torchvision
mean/std transform runs host-side in the data pipeline, same as training —
SURVEY.md §2.4). Tested in tests/test_export_serving.py.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_forward(arch: str, num_classes: int, dtype_name: str,
                  weights: dict | None, image_size: int, batch_size: int,
                  dw_impl: str = "auto", raw_input: bool = False):
    """(jitted eval-forward closure with weights baked in, example input).

    ``raw_input=True`` bakes the torchvision normalize step into the
    artifact: the call contract becomes uint8 [batch,H,W,3] RGB (decoded +
    resized, 0–255) and the uint8→[0,1]→(x−mean)/std pipeline runs
    on-accelerator in float32 (transforms.py:120 semantics) — the serving
    host then needs only decode + resize."""
    import jax
    import jax.numpy as jnp

    from mnasnet_tpu import create_model
    from mnasnet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = create_model(arch, num_classes=num_classes, dtype=dtype,
                         dw_impl=dw_impl)
    if weights is None:
        weights = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, image_size, image_size, 3)), train=False,
        )
    weights = jax.tree.map(jnp.asarray, weights)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def forward(images):
        if raw_input:
            images = (images.astype(jnp.float32) / 255.0 - mean) / std
        # fp32 in → logits fp32 out regardless of the compute dtype, so the
        # serving contract is dtype-stable across exported variants.
        logits = model.apply(weights, images, train=False)
        return logits.astype(jnp.float32)

    in_dtype = jnp.uint8 if raw_input else jnp.float32
    x = jnp.zeros((batch_size, image_size, image_size, 3), in_dtype)
    return jax.jit(forward), x


def load_weights(args) -> dict | None:
    import jax
    import jax.numpy as jnp

    if args.random_init:
        return None
    if args.pretrained:
        import torch

        from mnasnet_tpu import create_model
        from mnasnet_tpu.convert.torch_converter import torch_to_flax

        alpha = create_model(args.arch).alpha
        ckpt = torch.load(args.pretrained, map_location="cpu",
                          weights_only=True)
        sd = ckpt.get("state_dict", ckpt)
        return jax.tree.map(jnp.asarray, torch_to_flax(sd, alpha))
    if args.resume:
        from mnasnet_tpu.train.checkpoint import CheckpointManager

        variables, _, _ = CheckpointManager(
            os.path.abspath(args.resume)
        ).restore_variables(best=args.best, use_ema=args.use_ema)
        return jax.tree.map(jnp.asarray, variables)
    raise SystemExit("need --resume, --pretrained, or --random-init")


def export_artifact(fn, x, platforms, symbolic_batch: bool = False) -> bytes:
    """``symbolic_batch=True`` exports with the leading dim symbolic, so ONE
    artifact serves ANY batch size (verified exact for b ∈ {1,3,16} in
    tests/test_export_serving.py) — XLA recompiles per concrete b at load
    time, which is the normal serving trade-off."""
    import jax

    if symbolic_batch:
        _, h, w, c = x.shape
        (x,) = jax.export.symbolic_args_specs((x,), f"b, {h}, {w}, {c}")
    exported = jax.export.export(fn, platforms=platforms)(x)
    return exported.serialize()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("-a", "--arch", default="mnasnet1_0")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--resume", default="", help="orbax checkpoint dir")
    p.add_argument("--pretrained", default="", help="torch state_dict file")
    p.add_argument("--random-init", action="store_true",
                   help="export with fresh init weights (smoke/bench only)")
    p.add_argument("--use-ema", action="store_true",
                   help="export the --model-ema averaged weights")
    p.add_argument("--best", action="store_true",
                   help="export the best-acc1 checkpoint, not the latest")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--fused-kernels", choices=["auto", "pallas", "xla"],
                   default="auto")
    p.add_argument("--symbolic-batch", action="store_true",
                   help="export with a symbolic leading dim: one artifact "
                        "serves any batch size (-b then only sizes the "
                        "--verify replay)")
    p.add_argument("--raw-input", action="store_true",
                   help="bake the torchvision normalize into the artifact: "
                        "input becomes uint8 RGB 0-255 (decoded+resized); "
                        "/255, mean/std run on-accelerator")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets (default tpu,cpu "
                        "— one artifact serves both)")
    p.add_argument("--out", default="model.shlo")
    p.add_argument("--verify", default="", metavar="ARTIFACT",
                   help="instead of exporting: deserialize ARTIFACT, run "
                        "it, and compare against the live forward")
    args = p.parse_args(argv)

    import numpy as np

    import jax

    from mnasnet_tpu.utils.backend_probe import apply_jax_platforms_env

    # Export only TRACES the forward — no step ever runs on a chip — and
    # jax.export lowers cross-platform (--platforms) regardless of the local
    # backend. Honor JAX_PLATFORMS=cpu (the axon sitecustomize otherwise
    # pins the TPU plugin) so a CPU host can cut TPU artifacts without
    # grabbing, or queueing behind, the real chip.
    apply_jax_platforms_env()

    weights = load_weights(args)
    fn, x = build_forward(
        args.arch, args.num_classes, args.dtype, weights,
        args.image_size, args.batch_size, dw_impl=args.fused_kernels,
        raw_input=args.raw_input,
    )

    if args.verify:
        with open(args.verify, "rb") as f:
            exported = jax.export.deserialize(f.read())
        rng = np.random.default_rng(0)
        if args.raw_input:
            img = rng.integers(0, 256, x.shape, dtype=np.uint8)
        else:
            img = rng.standard_normal(x.shape, dtype=np.float32)
        got = np.asarray(exported.call(img))
        want = np.asarray(fn(img))
        diff = float(np.abs(got - want).max())
        print(f"platforms={exported.platforms} "
              f"in={exported.in_avals} out={exported.out_avals}")
        print(f"max |artifact - live| = {diff:.3e}")
        if diff > 1e-5:
            raise SystemExit(f"verify FAILED: diff {diff}")
        print("verify OK")
        return 0

    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
    data = export_artifact(fn, x, platforms,
                           symbolic_batch=args.symbolic_batch)
    with open(args.out, "wb") as f:
        f.write(data)
    b = "b" if args.symbolic_batch else str(args.batch_size)
    in_ty = "uint8" if args.raw_input else "float32"
    print(f"wrote {args.out}: {len(data) / 1e6:.2f} MB, "
          f"platforms={platforms}, "
          f"call: f({in_ty}[{b},{args.image_size},"
          f"{args.image_size},3]) -> float32 logits")
    return 0


if __name__ == "__main__":
    sys.exit(main())
