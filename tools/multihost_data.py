#!/usr/bin/env python
"""Multi-host x real on-disk data composition proof (VERDICT r3 missing #2;
SURVEY.md §2.3 N8 "per-host sharding", §2.6).

Every prior 2-process proof ran ``--synthetic``; the dress rehearsal's
1000-class JPEG tree ran single-process. This tool executes the exact
composition a real TPU-pod ImageNet run would use — per-host
``ImageFolderDataset`` shards + the native fused decoder +
``make_array_from_process_local_data`` placement — under
``process_count == 2``, and proves the DistributedSampler contract on it:

  * the dress-rehearsal tree is generated on disk (1000 class dirs, tiny
    JPEGs, one CMYK file for the native-decoder fallback path);
  * two coordinated processes run the UNMODIFIED ``train.py`` CLI over it
    (``--decoder native-fast``), each consuming its host shard, with the
    loader's consumed-index log (``MNASNET_TPU_CONSUMED_LOG``) enabled;
  * the logs are unioned: train indices are pairwise DISJOINT across hosts
    and each consumed exactly once (the <global-batch drop_last tail is the
    only omission — the DistributedSampler drop-last contract); the val
    split's valid indices cover every file EXACTLY once (wrap padding is
    excluded via n_valid);
  * the per-rank decoder-fallback counters sum to exactly 1 across hosts
    (the single CMYK file, decoded by whichever host's shard holds it);
  * the whole 2-process run is executed twice and the final collective
    checkpoints compared leaf-by-leaf BITWISE (same determinism bar as the
    synthetic proof, MULTIHOST_r03.json).

Emits MULTIHOST_DATA_r04.json. Run: python tools/multihost_data.py
(CPU; ~10 min at the default size). Reuses the launch/bootstrap machinery
of tools/multihost_smoke.py.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.dress_rehearsal import make_tree  # noqa: E402
from tools.multihost_smoke import (  # noqa: E402
    _BOOTSTRAP, _env, _free_port, _wait_multihost,
)

ARCH = "mnasnet0_5"
IMG = 64
GLOBAL_BATCH = 32
LR = 1e-4  # tiny on purpose — see multihost_smoke.py's trajectory-chaos note


def _train_flags(data: str, outdir: str, n_classes: int) -> list:
    return [
        data,
        "--deterministic",
        "--arch", ARCH,
        "--image-size", str(IMG),
        "--num-classes", str(n_classes),
        "--batch-size", str(GLOBAL_BATCH),
        "--optimizer", "sgd",
        "--lr", str(LR),
        "--lr-schedule", "constant",
        "--warmup-epochs", "0",
        "--workers", "2",
        "--print-freq", "20",
        "--decoder", "native-fast",
        "--epochs", "1",
        "--output-dir", outdir,
    ]


def _run_pair(data: str, outdir: str, n_classes: int, work: str,
              tag: str) -> list:
    """Two coordinated train.py processes over the on-disk tree; returns the
    per-rank log paths (train.py stdout) for counter parsing."""
    port = _free_port()
    procs, logs, lognames = [], [], []
    for rank in range(2):
        cmd = [
            sys.executable, "-c", _BOOTSTRAP, "train.py",
            *_train_flags(data, outdir, n_classes),
            "--dist-url", f"localhost:{port}",
            "--world-size", "2",
            "--rank", str(rank),
        ]
        env = _env(4)
        env["MNASNET_TPU_CONSUMED_LOG"] = os.path.join(
            work, f"consumed_{tag}.rank{rank}.jsonl"
        )
        logname = os.path.join(work, f"{tag}.rank{rank}.log")
        log = open(logname, "w")
        logs.append(log)
        lognames.append(logname)
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
        ))
    _wait_multihost(procs, logs, lognames, timeout=2400)
    return lognames


def _parse_consumed(work: str, tag: str, n_train: int, n_val: int) -> dict:
    """Union the two ranks' consumed-index logs; check the sampler contract."""
    per_rank_train, per_rank_val = [], []
    for rank in range(2):
        train_idx, val_valid = [], []
        with open(os.path.join(work, f"consumed_{tag}.rank{rank}.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec["n"] == n_train:
                    train_idx.extend(rec["indices"])
                elif rec["n"] == n_val:
                    k = rec["n_valid"]
                    val_valid.extend(rec["indices"][: len(rec["indices"])
                                                    if k is None else k])
                else:
                    raise AssertionError(f"unexpected dataset size {rec['n']}")
        per_rank_train.append(train_idx)
        per_rank_val.append(val_valid)

    t0, t1 = map(set, per_rank_train)
    # no within-host repeats (drop_last=True: no wrap padding on train)
    train_unique = (len(t0) == len(per_rank_train[0])
                    and len(t1) == len(per_rank_train[1]))
    train_disjoint = not (t0 & t1)
    consumed = t0 | t1
    dropped = set(range(n_train)) - consumed
    # drop_last drops < batch-per-shard per host at each of the two levels
    # (shard remainder + batch remainder), bounded by the global batch
    train_tail_ok = len(dropped) < GLOBAL_BATCH and consumed <= set(
        range(n_train)
    )

    v_all = per_rank_val[0] + per_rank_val[1]
    val_exactly_once = sorted(v_all) == list(range(n_val))
    return {
        "train_consumed": len(consumed),
        "train_dropped_tail": len(dropped),
        "train_unique_within_hosts": train_unique,
        "train_disjoint_across_hosts": train_disjoint,
        "train_tail_ok": train_tail_ok,
        "val_seen_exactly_once": val_exactly_once,
        "val_files": n_val,
        "ok": bool(train_unique and train_disjoint and train_tail_ok
                   and val_exactly_once),
    }


def _fallback_total(lognames: list) -> int:
    """Sum the per-rank exact fallback counters train.py prints per epoch
    (the LAST line per rank is the epoch-final cumulative count)."""
    total = 0
    for logname in lognames:
        with open(logname) as f:
            m = re.findall(r"decoder-fallbacks: (\d+) ", f.read())
        total += int(m[-1]) if m else 0
    return total


def _compare_bitwise(dir_a: str, dir_b: str, n_classes: int,
                     work: str) -> dict:
    """Template-restore both final checkpoints in an 8-device subprocess and
    diff leaf-by-leaf (the saved shardings name multi-host device ids, so
    the restore needs a mesh-matching template — same approach as
    multihost_smoke.compare, parametrized for this run's config)."""
    out = os.path.join(work, "compare.json")
    code = f"""
import json
import jax
import jax.numpy as jnp
import numpy as np
from mnasnet_tpu import create_model
from mnasnet_tpu.train.checkpoint import CheckpointManager
from mnasnet_tpu.train.optim import create_optimizer
from mnasnet_tpu.train.schedules import make_schedule
from mnasnet_tpu.train.trainer import Trainer

assert len(jax.devices()) == 8
model = create_model(
    {ARCH!r}, num_classes={n_classes}, dtype=jnp.bfloat16, dw_impl="auto",
    bn_stats="two_pass", bn_ema="external", stem_s2d=True,
)
schedule = make_schedule("constant", {LR}, 1, 1, warmup_epochs=0.0)
tx = create_optimizer("sgd", schedule, momentum=0.9, weight_decay=1e-5,
                      fused="small")
trainer = Trainer(model, tx, label_smoothing=0.1,
                  compute_dtype=jnp.bfloat16, print_freq=1)
template = trainer.create_state(jax.random.PRNGKey(0), {IMG})
sa, ea, _ = CheckpointManager({dir_a!r}).restore(template)
sb, eb, _ = CheckpointManager({dir_b!r}).restore(template)
assert ea == eb, (ea, eb)
mism, total = [], [0]
def cmp(path, a, b):
    a, b = np.asarray(a), np.asarray(b)
    total[0] += 1
    if not np.array_equal(a, b):
        mism.append(jax.tree_util.keystr(path))
va = {{"params": sa.params, "batch_stats": sa.batch_stats}}
vb = {{"params": sb.params, "batch_stats": sb.batch_stats}}
jax.tree_util.tree_map_with_path(cmp, va, vb)
json.dump({{"leaves_compared": total[0],
           "bitwise_match": not mism,
           "mismatches": mism[:10]}}, open({out!r}, "w"))
"""
    script = os.path.join(work, "compare_script.py")
    with open(script, "w") as f:
        f.write(code)
    subprocess.run(
        [sys.executable, "-c", _BOOTSTRAP, script],
        cwd=REPO, env=_env(8), check=True, timeout=1200,
    )
    with open(out) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default=os.path.join(REPO, "MULTIHOST_DATA_r04.json"))
    ap.add_argument("--n-classes", type=int, default=1000)
    ap.add_argument("--keep", default=None, help="keep tree+logs here")
    args = ap.parse_args()

    tmp_ctx = tempfile.TemporaryDirectory() if args.keep is None else None
    work = args.keep or tmp_ctx.name
    os.makedirs(work, exist_ok=True)
    data = os.path.join(work, "data")

    print(f"generating {args.n_classes}-class JPEG tree ...", flush=True)
    info = make_tree(data, args.n_classes)
    n_train, n_val = info["counts"]["train"], info["counts"]["val"]

    print("[1/3] 2-process train.py over the on-disk tree "
          "(native-fast decoder, per-host shards)", flush=True)
    logs_a = _run_pair(data, os.path.join(work, "ckpt_a"), args.n_classes,
                       work, "a")
    sampler = _parse_consumed(work, "a", n_train, n_val)
    fallbacks = _fallback_total(logs_a)

    print("[2/3] rerun (bitwise determinism control)", flush=True)
    _run_pair(data, os.path.join(work, "ckpt_b"), args.n_classes, work, "b")

    print("[3/3] compare final checkpoints bitwise", flush=True)
    cmp = _compare_bitwise(os.path.join(work, "ckpt_a"),
                           os.path.join(work, "ckpt_b"),
                           args.n_classes, work)

    out = {
        "ok": bool(sampler["ok"] and fallbacks == 1 and cmp["bitwise_match"]),
        "n_processes": 2,
        "devices_per_process": 4,
        "n_classes": args.n_classes,
        "images": info["counts"],
        "decoder": "native-fast (C++ fused decoder, per-image PIL fallback)",
        "files_seen_once": sampler,
        "cmyk_fallback_total_across_hosts": fallbacks,
        "rerun_bitwise_identical": cmp["bitwise_match"],
        "leaves_compared": cmp["leaves_compared"],
        "params_match": cmp["bitwise_match"],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))
    if tmp_ctx is not None:
        tmp_ctx.cleanup()
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
