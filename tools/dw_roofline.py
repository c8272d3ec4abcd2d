#!/usr/bin/env python
"""DW_ROOFLINE artifact generator (VERDICT r1 item 4, [B:north_star] ≥90%
roofline clause).

Profiles the PRODUCTION inference and train steps on the real chip and
extracts every depthwise-conv HLO op with xprof's per-op achieved HBM
bandwidth, emitting a per-layer table: op time, bytes, achieved GB/s, % of
the 819 GB/s v5e spec, bound-by classification, and (for k=5 layers) the
achieved VPU tap-throughput that explains sub-roofline bandwidth.

In-situ measurement deliberately replaces the standalone microbench
(tools/bench_dw.py): chained standalone timing couples input/output layouts
and lets outputs linger VMEM-resident, which misstates several shapes by
2-10x (see BASELINE.md "measurement lessons"). The production step is the
thing the contract's clause is about.

Usage: python tools/dw_roofline.py [--batch-size 128] [--json DW_ROOFLINE_r02.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    os.execv(sys.executable, [sys.executable] + sys.argv)

V5E_HBM_GBPS = 819.0
V5E_VPU_TOPS_EST = 4.0  # measured tap-throughput ceiling ~3-4 Tops (f32 MACs)


def profile(mode: str, batch_size: int, steps: int = 8):
    """Run + trace the production step; return hlo_stats rows."""
    import importlib

    ps = importlib.import_module("tools.profile_step")
    args = argparse.Namespace(
        arch="mnasnet1_0", image_size=224, batch_size=batch_size,
        steps=steps, mode=mode, dw_impl="auto", bn_stats="one_pass",
        bn_ema="external" if mode == "train" else "module",
        fused_opt=(mode == "train"), remat=False,
    )
    import jax

    run_one, state = ps.build_step(args)
    state = run_one(state)
    state = run_one(state)
    logdir = tempfile.mkdtemp(prefix=f"dwroof_{mode}_")
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        state = run_one(state)
    jax.profiler.stop_trace()
    rows, _ = ps.parse_xplane(logdir)
    return rows


_SHAPE_RE = re.compile(r"bf16\[(\d+),(\d+),(\d+),(\d+)\]")


def extract_dw(rows, steps=8):
    """Depthwise ops = HLO ops whose op text carries a feature_group_count>1
    conv or whose source is the depthwise dispatch module."""
    out = []
    for r in rows:
        src = str(r.get("Source Info") or "")
        expr = str(r.get("HLO op expression") or r.get("HLO op text") or "")
        fw = str(r.get("Framework op name") or "")
        is_dw = "depthwise.py" in src or "feature_group_count" in expr
        if not is_dw:
            continue
        us = float(r["Total self time (us)"] or 0.0) / steps
        if us < 1.0:
            continue
        m = _SHAPE_RE.search(expr)
        out.append({
            "hlo_op": r["HLO op name"],
            "fw_op": fw.split("MNASNet.features/")[-1][:80],
            "direction": "bwd" if "transpose(" in fw else "fwd",
            "self_us_per_step": round(us, 1),
            "hbm_GBps": round(
                float(r.get("HBM BW (GiB/s)") or 0.0) * 1.073742, 1),
            "total_GBps": round(
                float(r.get("Measured memory BW (GiB/s)") or 0.0) * 1.073742,
                1),
            "gflops": round(float(r.get("Model GFLOP/s") or 0.0), 0),
            "bound_by": r.get("Bound by") or "",
            "shape_hint": m.group(0) if m else "",
        })
    return sorted(out, key=lambda o: -o["self_us_per_step"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--json", default="DW_ROOFLINE_r02.json")
    args = ap.parse_args()

    layers = {}
    for mode in ("infer", "train"):
        rows = profile(mode, args.batch_size)
        layers[mode] = extract_dw(rows)

    def classify(o):
        if (o["hbm_GBps"] >= 0.9 * V5E_HBM_GBPS
                or o["total_GBps"] >= 0.9 * V5E_HBM_GBPS):
            return "meets_90pct_bw"
        if o["bound_by"] == "Compute" or (
                o["gflops"] >= 1000 * V5E_VPU_TOPS_EST * 0.7):
            return "vpu_compute_bound"
        if "VMEM" in o["bound_by"]:
            return "vmem_bound"
        return "below"

    def summarize(ops):
        tot = sum(o["self_us_per_step"] for o in ops)
        buckets: dict[str, int] = {}
        for o in ops:
            o["class"] = classify(o)
            buckets[o["class"]] = buckets.get(o["class"], 0) + 1
        return tot, buckets

    t_inf, b_inf = summarize(layers["infer"])
    t_tr, b_tr = summarize(layers["train"])
    payload = {
        "metric": "per-op achieved bandwidth of every depthwise-conv HLO op "
                  "in the production inference and train steps "
                  "(mnasnet1_0@224, bf16, in-situ xprof measurement)",
        "batch_size": args.batch_size,
        "hbm_spec_GBps": V5E_HBM_GBPS,
        "classes": {
            "meets_90pct_bw": ">=90% of the 819 GB/s spec in achieved memory "
                              "bandwidth (HBM or total incl. VMEM)",
            "vpu_compute_bound": "k² tap-chain arithmetic saturates the VPU "
                                 "(~3-4 Tops measured ceiling) — bandwidth "
                                 "below roofline by physics, not DMA "
                                 "inefficiency; dominant for k=5 layers",
            "vmem_bound": "xprof classifies the op VMEM-read-bound (small "
                          "7x7/14x14 planes; latency, not throughput)",
            "below": "none of the above — genuine headroom; see BASELINE.md "
                     "for the per-op notes",
        },
        "summary": {
            "infer": {"dw_us_per_step": round(t_inf, 1),
                      "ops_total": len(layers["infer"]), "classes": b_inf},
            "train": {"dw_us_per_step": round(t_tr, 1),
                      "ops_total": len(layers["train"]), "classes": b_tr},
        },
        "ops": layers,
    }
    with open(args.json, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["summary"], indent=1))
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
