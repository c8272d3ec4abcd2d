#!/usr/bin/env python
"""Train-step profiler: capture a jax.profiler trace of N train steps and
print the device-time breakdown by HLO op category (VERDICT r1 items 3/5 —
layout copies, BN backward chains, batch-scaling investigation).

Usage:
  python tools/profile_step.py --batch-size 128 [--steps 8] [--json OUT.json]
  python tools/profile_step.py --batch-size 256 --mode infer

Parses the captured .xplane.pb with xprof's raw_to_tool_data (needs
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python; the script re-execs itself
with it set). Prints per-op rows sorted by self time plus a category rollup
(fusion kinds, copies, convs, all-else).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def build_step(args):
    import jax
    import jax.numpy as jnp

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import make_predict_fn, make_train_step

    opts = json.loads(args.compiler_options) if args.compiler_options else None

    model = create_model(
        args.arch, dtype=jnp.bfloat16, dw_impl=args.dw_impl,
        bn_stats=args.bn_stats, remat=args.remat, bn_ema=args.bn_ema,
        stem_s2d=args.stem_s2d,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.image_size, args.image_size, 3), jnp.bfloat16),
        train=False,
    )
    images = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.batch_size, args.image_size, args.image_size, 3), jnp.bfloat16,
    )
    labels = jnp.zeros((args.batch_size,), jnp.int32)

    if args.mode == "infer":
        predict = jax.jit(make_predict_fn(model), compiler_options=opts)
        p, bs = variables["params"], variables["batch_stats"]

        def run_one(state):
            return jax.block_until_ready(predict(p, bs, images))

        return run_one, None

    fused = {"none": False, "small": "small", "full": True}[args.fused_opt]
    tx = create_optimizer("rmsprop", 0.01, fused=fused)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(0)
    )
    step = jax.jit(make_train_step(model, tx, 0.1), donate_argnums=(0,),
                   compiler_options=opts)

    def run_one(state):
        state, metrics = step(state, images, labels)
        jax.block_until_ready(metrics["loss"])
        return state

    return run_one, state


def parse_xplane(logdir: str):
    """Return per-HLO-op dict rows from the trace's hlo_stats tool."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    path = max(paths, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "hlo_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    labels = [c["label"] for c in d["cols"]]
    rows = []
    for r in d["rows"]:
        rows.append({k: (c or {}).get("v") for k, c in zip(labels, r["c"])})
    return rows, path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--mode", choices=["train", "infer"], default="train")
    p.add_argument("--dw-impl", default="auto")
    p.add_argument("--bn-stats", default="one_pass")
    p.add_argument("--bn-ema", default="module", choices=["module", "external"])
    p.add_argument("--fused-opt", default="none",
                   choices=["none", "small", "full"])
    p.add_argument("--stem-s2d", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument(
        "--compiler-options", default=None,
        help="JSON dict of XLA:TPU compile options attached to the step jit "
        "(verifies e.g. the nd_short_transfer win per-op; see "
        "utils/xla_options.py)",
    )
    p.add_argument("--json", default=None, help="write raw rows to this file")
    p.add_argument("--logdir", default=None)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    import jax

    run_one, state = build_step(args)
    state = run_one(state)  # compile outside the trace
    state = run_one(state)

    logdir = args.logdir or tempfile.mkdtemp(prefix="jaxprof_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        state = run_one(state)
    jax.profiler.stop_trace()

    rows, path = parse_xplane(logdir)
    device_rows = []
    for r in rows:
        us = float(r["Total self time (us)"] or 0.0)
        src = str(r.get("Source Info") or "")
        if "title='" in src:  # strip the html wrapper xprof emits
            src = src.split("'>", 1)[-1].split("</div>")[0]
        device_rows.append({
            "name": r["HLO op name"],
            "category": r["HLO op category"],
            "fw_op": r.get("Framework op name") or "",
            "self_us": us,
            "bw_gibs": float(r.get("Measured memory BW (GiB/s)") or 0.0),
            "gflops": float(r.get("Model GFLOP/s") or 0.0),
            "bound_by": r.get("Bound by") or "",
            "occurrences": float(r.get("#Occurrences") or 0.0),
            "source": src,
        })

    total = sum(r["self_us"] for r in device_rows)
    per_step = total / args.steps
    print(f"\n== {args.mode} bs={args.batch_size} {args.arch}@{args.image_size} "
          f"dw={args.dw_impl} bn={args.bn_stats} remat={args.remat}")
    print(f"device total {total/1e3:.2f} ms over {args.steps} steps "
          f"→ {per_step/1e3:.3f} ms/step "
          f"→ {args.batch_size / (per_step/1e6):,.0f} img/s (device-time bound)")

    by_cat: dict[str, float] = {}
    for r in device_rows:
        by_cat[r["category"]] = by_cat.get(r["category"], 0.0) + r["self_us"]
    print("\n-- by category --")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/total*100:6.1f}%  {us/args.steps/1e3:8.3f} ms/step  {cat}")

    print(f"\n-- top {args.top} ops by self time --")
    for r in sorted(device_rows, key=lambda r: -r["self_us"])[: args.top]:
        print(f"{r['self_us']/total*100:5.1f}%  {r['self_us']/args.steps:8.1f} us/st "
              f"{r['bw_gibs']:6.0f} GiB/s {r['gflops']:7.0f} GF/s "
              f"[{r['bound_by']:>4}] [{r['category']}] {r['name']}  "
              f"{r['fw_op'][:70]}  {r['source']}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "config": vars(args),
                    "per_step_ms": per_step / 1e3,
                    "by_category_us_per_step": {
                        k: v / args.steps for k, v in by_cat.items()
                    },
                    "ops": sorted(device_rows, key=lambda r: -r["self_us"]),
                },
                f, indent=1,
            )
        print(f"\nwrote {args.json}")
    print(f"trace: {path}")


if __name__ == "__main__":
    main()
