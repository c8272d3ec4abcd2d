#!/usr/bin/env python
"""Serving-export latency record (VERDICT r3 item 8 + r4 missing #2,
[B:configs[0..1]]).

The StableHLO serving artifact (tools/export_serving.py) has exact-match
correctness tests; this tool measures it. Round 4's version compared
artifact vs live with NO compiler options on either side, which proved
"export costs nothing" only bare-vs-bare — while the production live
predict shipped the tuned infer options (+7–11% at bs128), so a fleet
serving the artifact silently forfeited that win (VERDICT r4 missing #2).
This version times FOUR routes at each batch size:

  * live jitted predict, bare          * live predict, shipped options
  * artifact (bare jit of the call)    * artifact via serving.load_serving

where "shipped options" = the batch-ROUTED default
(``default_compiler_options("infer", batch_size=bs)`` — the tuned set only
where it measured ≥ bare, utils/xla_options.py), i.e. exactly what
``load_serving`` attaches. The deliverable claim: the optioned artifact
path matches the optioned live predict — the export costs nothing RELATIVE
TO THE TUNED live path, not just relative to a bare one.

Timing: two-point slope over in-jit fori_loop chains, min-of-N — single-call
timing is dispatch-dominated through the axon tunnel (BASELINE.md
"microbenchmark lessons"). The artifact's call is traced INTO the chain jit
(so the chain jit's compiler_options govern the whole program — the same
mechanism load_serving uses per call).

Emits EXPORT_LATENCY_r05.json. Run: python tools/export_latency.py  (TPU;
add JAX_PLATFORMS=cpu for the CPU column).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.export_serving import build_forward, export_artifact  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batches", default="1,8,128")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "EXPORT_LATENCY_r05.json"))
    p.add_argument("--blob", default=None,
                   help="path to a pre-exported symbolic-batch artifact for "
                        "the SAME arch/weights (tools/export_serving.py "
                        "--random-init --symbolic-batch): skips the ~20 min "
                        "host-side export trace; export_seconds is then "
                        "reported from the sidecar '<blob>.export_seconds' "
                        "if present")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu.utils.backend_probe import apply_jax_platforms_env
    from mnasnet_tpu.utils.xla_options import default_compiler_options

    apply_jax_platforms_env()  # docstring promises the CPU column works
    backend = jax.default_backend()
    img = args.image_size
    batches = [int(b) for b in args.batches.split(",")]

    def slope_time(make_chain, lo, hi):
        f_lo, f_hi = make_chain(lo), make_chain(hi)
        jax.block_until_ready(f_lo())
        jax.block_until_ready(f_hi())
        t_lo = t_hi = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(f_lo())
            t = time.perf_counter() - t0
            t_lo = t if t_lo is None else min(t_lo, t)
            t0 = time.perf_counter()
            jax.block_until_ready(f_hi())
            t = time.perf_counter() - t0
            t_hi = t if t_hi is None else min(t_hi, t)
        return (t_hi - t_lo) / (hi - lo)

    # One symbolic-batch artifact serves every bs — the production shape
    # ([B:configs[0]] single-image .. [B:configs[1]] batched serving).
    fn, x0 = build_forward(args.arch, 1000, "bfloat16", None, img, 8)
    if args.blob:
        with open(args.blob, "rb") as f:
            blob = f.read()
        export_s = None
        sidecar = args.blob + ".export_seconds"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                export_s = float(f.read().strip())
    else:
        t0 = time.time()
        blob = export_artifact(fn, x0,
                               [backend if backend != "axon" else "tpu"],
                               symbolic_batch=True)
        export_s = time.time() - t0
    t0 = time.time()
    exported = jax.export.deserialize(blob)
    deser_s = time.time() - t0

    rows = []
    for bs in batches:
        x = jax.random.normal(jax.random.PRNGKey(0), (bs, img, img, 3),
                              jnp.float32)
        # chain lengths scale down with batch so each timing call stays
        # ~O(100ms) device time
        lo, hi = (32, 128) if bs <= 8 else (4, 16)
        opts = default_compiler_options("infer", batch_size=bs)

        def chain_of(call, options):
            def make_chain(iters):
                @functools.partial(jax.jit, compiler_options=options)
                def f(x):
                    def body(_, carry):
                        x, acc = carry
                        y = call(x)
                        return (-x, acc + jnp.sum(y))
                    return lax.fori_loop(
                        0, iters, body, (x, jnp.zeros((), jnp.float32))
                    )[1]
                return lambda: f(x)
            return make_chain

        t_live = slope_time(chain_of(fn, None), lo, hi)
        t_live_opt = slope_time(chain_of(fn, opts), lo, hi)
        t_art = slope_time(chain_of(exported.call, None), lo, hi)
        t_art_opt = slope_time(chain_of(exported.call, opts), lo, hi)
        rows.append({
            "batch": bs,
            "shipped_options": opts,
            "live_bare_ms": round(t_live * 1e3, 4),
            "live_opt_ms": round(t_live_opt * 1e3, 4),
            "artifact_bare_ms": round(t_art * 1e3, 4),
            "artifact_opt_ms": round(t_art_opt * 1e3, 4),
            "artifact_vs_live_opt_pct": round(
                100 * (t_art_opt / t_live_opt - 1), 2),
            "opt_vs_bare_artifact_pct": round(
                100 * (t_art_opt / t_art - 1), 2),
            "artifact_opt_img_s": round(bs / t_art_opt),
            "live_opt_img_s": round(bs / t_live_opt),
        })
        print(f"bs={bs:4d}  live {t_live*1e3:8.3f}/{t_live_opt*1e3:8.3f} ms "
              f"(bare/opt)  artifact {t_art*1e3:8.3f}/{t_art_opt*1e3:8.3f} "
              f"ms  art-vs-live(opt) "
              f"{rows[-1]['artifact_vs_live_opt_pct']:+.1f}%", flush=True)

    out = {
        "arch": args.arch,
        "image_size": img,
        "backend": backend,
        "artifact": {
            "bytes": len(blob),
            "symbolic_batch": True,
            "export_seconds": None if export_s is None
            else round(export_s, 2),
            "deserialize_seconds": round(deser_s, 3),
            "note": "one-time per-process costs; per-batch-size XLA "
                    "compile happens on first call (same as live jit)",
        },
        "method": f"two-point slope over in-jit fori_loop chains, "
                  f"min-of-{args.repeats}; 'opt' = the batch-routed "
                  f"shipped options serving.load_serving attaches",
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
