#!/usr/bin/env python
"""AOT memory accounting for the production train step vs --grad-accum.

``jax.jit(...).lower(...).compile().memory_analysis()`` exposes the
compiler's own buffer-assignment totals (argument/output/temp/generated
code sizes) WITHOUT executing anything — so the activation-memory claim
behind gradient accumulation ("memory scales with batch/K, one
microbatch's activations live at a time") is checkable as a compile-only
artifact on any backend, and at production shapes that would OOM if run.

Usage:
    python tools/memory_probe.py [--arch mnasnet1_0] [--image-size 224]
        [--batch-size 128] [--accums 1,2,4,8] [--out memory_probe.json]

Run on the TPU backend for the real HBM numbers (the CPU backend compiles
the same HLO but assigns host buffers; relative scaling is still
indicative). Temp size is where activations for the backward pass live;
expect it to fall roughly as 1/K with --grad-accum K at fixed global
batch, while argument size (params/optimizer state) stays flat.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--accums", default="1,2,4,8")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import make_train_step

    bs, img = args.batch_size, args.image_size
    model = create_model(
        args.arch, dtype=jnp.bfloat16, bn_ema="external", stem_s2d=True
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False,
    )
    tx = create_optimizer("rmsprop", 0.01, fused="small")
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(0)
    )
    images = jax.ShapeDtypeStruct((bs, img, img, 3), jnp.bfloat16)
    labels = jax.ShapeDtypeStruct((bs,), jnp.int32)

    rows = []
    for k in [int(a) for a in args.accums.split(",")]:
        step = make_train_step(model, tx, 0.1, grad_accum=k)
        compiled = (
            jax.jit(step, donate_argnums=(0,)).lower(state, images, labels)
            .compile()
        )
        m = compiled.memory_analysis()
        row = {"grad_accum": k, "batch_size": bs}
        for key in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(m, key, None)
            if v is not None:
                row[key.replace("_in_bytes", "_mib")] = round(v / 2**20, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {
                    "arch": args.arch,
                    "image_size": img,
                    "batch_size": bs,
                    "backend": jax.default_backend(),
                    "note": "AOT buffer-assignment totals from "
                            "compile().memory_analysis(); temp = live "
                            "intermediates incl. saved activations",
                    "rows": rows,
                },
                f, indent=1,
            )
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
