#!/usr/bin/env python
"""Slope-timed wall-clock comparison of train-step variants (perf work
bookkeeping for VERDICT r2 items 3/5). Prints img/s for each requested
(batch, bn_ema, fused_opt, bn_stats, dw_impl) combo.

Usage: python tools/bench_train_variants.py --batch-sizes 128,256 \
          --variants base,fused
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each variant: model/optimizer knob overrides on top of the defaults
# (module EMA, unfused optimizer, one-pass BN, 'auto' dw, conv pw, no s2d).
_BEST = dict(bn_ema="external", fused_opt="small", stem_s2d=True)
VARIANTS = {
    "base": dict(),
    "ema": dict(bn_ema="external"),
    "opt": dict(fused_opt=True),
    "fused": dict(bn_ema="external", fused_opt=True),
    "ema-optsmall": dict(bn_ema="external", fused_opt="small"),
    "ema-twopass": dict(bn_ema="external", bn_stats="two_pass"),
    "pwdot": dict(pw_lowering="dot"),
    "pwdot-ema": dict(bn_ema="external", pw_lowering="dot"),
    "s2d": dict(stem_s2d=True),
    "best": dict(_BEST),
    "hyb2": dict(dw_impl="hybrid"),
    "best-hyb2": dict(_BEST, dw_impl="hybrid"),
    # Round-3 candidates (VERDICT r2 item 2):
    # (a) Pallas BN-bwd region fusion on top of the production config
    "best-bnbwd": dict(_BEST, bn_bwd="pallas_region"),
    "bnbwd": dict(bn_bwd="pallas_region"),
    # (b) channel padding to full lane multiples (A/B: absolute ms/step —
    # the padded model does MORE logical work; if ms/step stays flat the
    # sub-128-lane tilings/relayouts were the cost)
    "best-cpad64": dict(_BEST, channel_pad=64),
    "best-cpad128": dict(_BEST, channel_pad=128),
    # Round-3 follow-up: pure-XLA tap-sum dw forward — autodiff yields the
    # tap-wise wgrad WITHOUT the custom_vjp fusion barrier that sank 'hybrid'.
    "best-taps": dict(_BEST, dw_impl="taps"),
    "best-taps2": dict(_BEST, dw_impl="taps2"),
    "taps": dict(dw_impl="taps"),
    # Remat A/B on the production config (trade recompute for spill traffic —
    # the copy storm is mid-graph spills per BASELINE.md round 2).
    "best-remat": dict(_BEST, remat=True),
    # Gradient accumulation overhead at fixed GLOBAL batch (bs stays the
    # flag value; the step scans k microbatches of bs/k — expect some loss
    # from smaller per-conv batches; the knob buys memory, not speed).
    "best-accum2": dict(_BEST, grad_accum=2),
    "best-accum4": dict(_BEST, grad_accum=4),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-sizes", default="128")
    p.add_argument("--variants", default="base,fused")
    p.add_argument("--iters-lo", type=int, default=4)
    p.add_argument("--iters-hi", type=int, default=16)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument(
        "--compiler-options",
        default=None,
        help="JSON dict of XLA:TPU compile options attached to the jit'd "
        "chain (e.g. '{\"xla_tpu_scoped_vmem_limit_kib\": \"65536\"}'). "
        "Unlike LIBTPU_INIT_ARGS these DO travel through the axon "
        "remote-compile tunnel (invalid names raise from the remote "
        "compile helper — validated round 3).",
    )
    p.add_argument("--out", default=None,
                   help="also write the rows as a JSON artifact")
    args = p.parse_args()
    compiler_options = (
        __import__("json").loads(args.compiler_options)
        if args.compiler_options
        else None
    )

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import make_train_step

    rows = []

    def slope(f_lo, f_hi):
        jax.block_until_ready(f_lo())
        jax.block_until_ready(f_hi())
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(f_lo())
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f_hi())
            t_hi = time.perf_counter() - t0
            s = (t_hi - t_lo) / (args.iters_hi - args.iters_lo)
            best = s if best is None else min(best, s)
        return best

    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        images = jax.random.normal(
            jax.random.PRNGKey(0), (bs, args.image_size, args.image_size, 3),
            jnp.bfloat16,
        )
        labels = jnp.zeros((bs,), jnp.int32)
        for name in args.variants.split(","):
            v = dict(VARIANTS[name])
            fused_opt = v.pop("fused_opt", False)
            grad_accum = v.pop("grad_accum", 1)
            model = create_model(args.arch, dtype=jnp.bfloat16, **v)
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.image_size, args.image_size, 3), jnp.bfloat16),
                train=False,
            )
            tx = create_optimizer("rmsprop", 0.01, fused=fused_opt)
            state0 = TrainState.create(
                variables["params"], variables["batch_stats"], tx,
                jax.random.PRNGKey(0),
            )
            step = make_train_step(model, tx, 0.1, grad_accum=grad_accum)

            def make_chain(iters):
                @functools.partial(jax.jit, compiler_options=compiler_options)
                def f(state, x):
                    def body(_, carry):
                        state, x, acc = carry
                        state, metrics = step(state, x, labels)
                        return (state, -x, acc + metrics["loss"])
                    _, _, acc = lax.fori_loop(
                        0, iters, body, (state, x, jnp.zeros((), jnp.float32))
                    )
                    return acc
                return lambda: f(state0, x)

            x = images
            t = slope(make_chain(args.iters_lo), make_chain(args.iters_hi))
            print(f"bs={bs:4} {name:6} {t*1e3:7.3f} ms/step  {bs/t:9,.0f} img/s",
                  flush=True)
            rows.append({"batch": bs, "variant": name,
                         "ms_per_step": round(t * 1e3, 3),
                         "img_s": round(bs / t)})
            if args.out:
                with open(args.out, "w") as f:
                    json.dump({
                        "arch": args.arch,
                        "image_size": args.image_size,
                        "method": f"two-point slope fori_loop chains, "
                                  f"min-of-{args.repeats} (sequential)",
                        "compiler_options": compiler_options,
                        "rows": rows,
                    }, f, indent=1)
                    f.write("\n")


if __name__ == "__main__":
    main()
