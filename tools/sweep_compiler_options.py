#!/usr/bin/env python
"""Sweep XLA:TPU compile options on the production train step (round 3).

Rounds 1-3 concluded the bs128 step is conv-emitter-bound and recorded
"no flag surface exists through the axon tunnel (LIBTPU_INIT_ARGS not
forwarded)". That conclusion missed a second surface: ``jax.jit(...,
compiler_options=...)`` attaches XLA:TPU flags to the compile request
itself, and the axon remote-compile helper *parses* them (an invalid flag
name raises HTTP 500 from the helper — verified). This tool sweeps the
plausible emitter/fusion/copy knobs on the real 'best'-config train step
and records ms/step per option set.

Usage: python tools/sweep_compiler_options.py [--out SWEEP_XLAFLAGS_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each entry: (label, {flag: value}). Values are strings (PJRT env-option
# format). Baseline (no options) is measured first and interleaved
# re-measured at the end to bound drift.
SWEEPS = [
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("fusion-cost", {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ("bundle-cost", {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
    ("nested-fusion", {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    ("licm4", {"xla_tpu_licm_size_inflation_ratio": "4"}),
    ("no-rwb", {"xla_tpu_rwb_fusion": "false"}),
    ("copy-chunks", {"xla_tpu_nd_short_transfer_max_chunks": "4096"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    (
        "vmem64m+fusion-cost",
        {
            "xla_tpu_scoped_vmem_limit_kib": "65536",
            "xla_tpu_enable_experimental_fusion_cost_model": "true",
        },
    ),
    # Refinement round: value sweep of the winning knob + pairwise combos
    # with the other measured positive (select with --only).
    ("copy-chunks1k", {"xla_tpu_nd_short_transfer_max_chunks": "1024"}),
    ("copy-chunks2k", {"xla_tpu_nd_short_transfer_max_chunks": "2048"}),
    ("copy-chunks8k", {"xla_tpu_nd_short_transfer_max_chunks": "8192"}),
    ("copy-chunks16k", {"xla_tpu_nd_short_transfer_max_chunks": "16384"}),
    (
        "copy-chunks+nested-fusion",
        {
            "xla_tpu_nd_short_transfer_max_chunks": "4096",
            "xla_tpu_enable_multi_level_nested_loop_fusion": "true",
        },
    ),
    (
        "copy-chunks+vmem64m",
        {
            "xla_tpu_nd_short_transfer_max_chunks": "4096",
            "xla_tpu_scoped_vmem_limit_kib": "65536",
        },
    ),
    (
        "copy-chunks+lhs",
        {
            "xla_tpu_nd_short_transfer_max_chunks": "4096",
            "xla_tpu_enable_latency_hiding_scheduler": "true",
        },
    ),
    # Remaining valid-probe knobs not yet A/B'd (copy/layout/dot families).
    ("no-dot-strength-red", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("scoped-vmem-offset", {"xla_tpu_allocate_scoped_vmem_at_same_offset": "false"}),
    ("copy-pad-unpad0", {"xla_tpu_copy_fusion_pad_unpad_ratio": "0"}),
    ("dot-grouping", {"xla_tpu_layout_use_dot_grouping": "true"}),
    ("order-dot-after-layout", {"xla_tpu_order_dot_after_layout": "true"}),
    ("prefetch-repeated", {"xla_tpu_use_repeated_instance_for_preferred_prefetch_time": "true"}),
    ("reduce-loop-dup", {"xla_tpu_reduce_loop_fusion_dup_with_unfusable_user": "true"}),
    # Valid-probed flags never A/B'd in the first campaign.
    ("async-copy-bw2", {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("async-copy-bw05", {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"}),
    ("no-dot-dot-fusion", {"xla_tpu_dot_dot_fusion": "false"}),
    ("dot-dot-dup", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--iters-lo", type=int, default=4)
    p.add_argument("--iters-hi", type=int, default=16)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=None)
    p.add_argument("--only", default=None,
                   help="comma-separated sweep labels to run")
    p.add_argument("--extra-json", default=None,
                   help="path to a JSON list of {label, options} entries "
                        "appended to the built-in sweep (e.g. flags newly "
                        "validated by probe_compiler_options --extended)")
    p.add_argument("--mode", choices=["train", "infer"], default="train",
                   help="which production step to sweep")
    p.add_argument("--interleave", action="store_true",
                   help="drift-robust protocol: compile ALL configs' chains "
                        "first, then time them round-robin for --repeats "
                        "rounds (min per config). The sequential protocol "
                        "confounds flag effects with machine/tunnel drift "
                        "over the sweep's ~20 min — round-4 measured the "
                        "drift at ±1 ms/step (~7%), LARGER than any flag "
                        "delta (SWEEP_XLAFLAGS_r04 baseline 15.11 vs "
                        "baseline-recheck 14.19 ms, zero flags both)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import make_predict_fn, make_train_step

    bs = args.batch_size
    images = jax.random.normal(
        jax.random.PRNGKey(0), (bs, args.image_size, args.image_size, 3),
        jnp.bfloat16,
    )
    labels = jnp.zeros((bs,), jnp.int32)

    # Production 'best' config (BASELINE.md): external EMA, fused small
    # updates, s2d stem, auto dw, rmsprop.
    model = create_model(
        args.arch, dtype=jnp.bfloat16, bn_ema="external", stem_s2d=True
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.image_size, args.image_size, 3), jnp.bfloat16),
        train=False,
    )
    tx = create_optimizer("rmsprop", 0.01, fused="small")
    state0 = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(0)
    )
    step = make_train_step(model, tx, 0.1)
    predict = make_predict_fn(model)

    def make_chain(iters, options):
        if args.mode == "infer":
            def f(x):
                def body(_, carry):
                    x, acc = carry
                    y = predict(
                        variables["params"], variables["batch_stats"], x
                    )
                    return (-x, acc + jnp.sum(y))
                return lax.fori_loop(
                    0, iters, body, (x, jnp.zeros((), jnp.float32))
                )[1]
            jf = jax.jit(f, compiler_options=options or None)
            return lambda: jf(images)

        def f(state, x):
            def body(_, carry):
                state, x, acc = carry
                state, metrics = step(state, x, labels)
                return (state, -x, acc + metrics["loss"])
            _, _, acc = lax.fori_loop(
                0, iters, body, (state, x, jnp.zeros((), jnp.float32))
            )
            return acc
        jf = jax.jit(f, compiler_options=options or None)
        return lambda: jf(state0, images)

    def slope(options):
        f_lo = make_chain(args.iters_lo, options)
        f_hi = make_chain(args.iters_hi, options)
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

    sweeps = list(SWEEPS)
    if args.extra_json:
        with open(args.extra_json) as f:
            sweeps += [(e["label"], e["options"]) for e in json.load(f)]
    if args.only:
        keep = set(args.only.split(","))
        sweeps = [s for s in sweeps if s[0] in keep]

    results = []

    def persist():
        # Rewrite after every entry: a tunnel flap mid-sweep must not lose
        # the measurements already taken.
        if not args.out:
            return
        with open(args.out, "w") as f:
            json.dump(
                {
                    "arch": args.arch,
                    "image_size": args.image_size,
                    "batch_size": bs,
                    "mode": args.mode,
                    "method": (
                        "slope-timed fori_loop chains, "
                        + (f"interleaved round-robin, slope of per-chain "
                           f"minima over {args.repeats} rounds "
                           f"(drift-robust)"
                           if args.interleave
                           else f"min over {args.repeats} repeats "
                                "(sequential — subject to machine drift)")
                    ),
                    "results": results,
                },
                f, indent=1,
            )
            f.write("\n")

    def run(label, options):
        try:
            t = slope(options)
            print(f"{label:22} {t*1e3:7.3f} ms/step  {bs/t:9,.0f} img/s",
                  flush=True)
            results.append({"label": label, "options": options,
                            "ms_per_step": t * 1e3, "img_s": bs / t})
        except Exception as e:  # invalid flag for this compiler version, OOM…
            print(f"{label:22} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            results.append({"label": label, "options": options,
                            "error": f"{type(e).__name__}: {str(e)[:300]}"})
        persist()

    if args.interleave:
        configs = [("baseline", {})] + sweeps
        chains = []
        for label, options in configs:
            try:
                f_lo = make_chain(args.iters_lo, options)
                f_hi = make_chain(args.iters_hi, options)
                jax.block_until_ready(f_lo())  # compile now
                jax.block_until_ready(f_hi())
                chains.append((label, options, f_lo, f_hi))
                print(f"compiled {label}", flush=True)
            except Exception as e:
                print(f"{label:22} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                results.append({"label": label, "options": options,
                                "error": f"{type(e).__name__}: "
                                         f"{str(e)[:300]}"})
        # Estimator: min(t_lo) and min(t_hi) tracked SEPARATELY across
        # rounds, slope from the two minima. min-of-per-round-slopes is
        # fragile — one anomalously slow t_lo round makes that round's
        # slope spuriously small (even negative) and the min latches it.
        # Under additive positive noise, min(t) per chain is the clean
        # estimate and the slope of the minima is the robust step time.
        best_lo = {label: None for label, *_ in chains}
        best_hi = {label: None for label, *_ in chains}
        for r in range(args.repeats):
            for label, options, f_lo, f_hi in chains:
                t0 = time.perf_counter()
                jax.block_until_ready(f_lo())
                t_lo = time.perf_counter() - t0
                t0 = time.perf_counter()
                jax.block_until_ready(f_hi())
                t_hi = time.perf_counter() - t0
                b = best_lo[label]
                best_lo[label] = t_lo if b is None else min(b, t_lo)
                b = best_hi[label]
                best_hi[label] = t_hi if b is None else min(b, t_hi)
            print(f"round {r + 1}/{args.repeats} done", flush=True)
        for label, options, *_ in chains:
            t = (best_hi[label] - best_lo[label]) / (
                args.iters_hi - args.iters_lo)
            print(f"{label:22} {t*1e3:7.3f} ms/step  {bs/t:9,.0f} img/s",
                  flush=True)
            results.append({"label": label, "options": options,
                            "ms_per_step": t * 1e3, "img_s": bs / t})
        persist()
    else:
        run("baseline", {})
        for label, options in sweeps:
            run(label, options)
        run("baseline-recheck", {})
    if args.out:
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
