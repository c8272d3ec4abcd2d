#!/usr/bin/env python
"""Multi-host preemption proof with REAL processes (SURVEY.md §5.3, §2.6).

Single-process preemption (SIGTERM → finish step → preempt checkpoint →
bitwise mid-epoch resume) is proven by tests/test_preempt.py. Multi-host is
the hard half: per-host SIGTERM timing could land hosts on different steps —
a collective deadlock — so the trainer feeds every step id to JAX's
preemption sync protocol (``multihost_utils.reached_preemption_sync_point``;
TSL's SIGTERM notifier propagates the notice through the coordination
service), which picks the SAME safe stop step on every host. This tool
exercises that protocol for real, on CPU, no cluster needed:

  1. control: an uninterrupted 2-process × 4-virtual-device ``train.py`` run
     (gloo cross-process collectives, collective orbax saves);
  2. preempt: the same run, but SIGTERM is delivered to ONE rank only
     (rank 1) mid-training — TSL's notifier owns the signal (the process
     must NOT die), both ranks must agree on a stop step, finish it, join
     the collective preempt-checkpoint save, and exit 0;
  3. resume: both ranks ``--resume`` and must re-enter at the exact step
     and finish training;
  4. compare: the final checkpoint must be BITWISE identical to the
     control's (same topology ⇒ same reduction order; the loader skips the
     consumed batches without decoding them).

Emits MULTIHOST_PREEMPT_r03.json:
  {ok, stop_step, resume_epoch, resume_step, bitwise_match, ...}.

Run:  python tools/multihost_preempt.py [--out MULTIHOST_PREEMPT_r03.json]
Also wrapped as a slow test: tests/test_multihost.py (RUN_SLOW=1).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import multihost_smoke as smoke  # noqa: E402  (launch/wait/compare reuse)

EPOCHS = 4  # 4 steps/epoch → 16 steps: plenty of runway after the trigger


def _read(path: str) -> str:
    try:
        with open(path) as f:
            return f.read()
    except OSError:
        return ""


def _preempt_run(outdir: str, log_prefix: str) -> int:
    """Launch the 2-rank run, SIGTERM rank 1 once epoch 1 starts, wait for
    BOTH ranks to exit 0, and return the agreed stop step."""
    procs, logs, lognames = smoke._launch_multihost(
        outdir, epochs=EPOCHS, resume=False, log_prefix=log_prefix
    )
    # Trigger: rank 0 printing epoch 1's first step means both ranks are
    # past compile and mid-run — ~12 steps of runway remain for the
    # protocol to pick a stop step.
    trigger = re.compile(r"Epoch: \[1\]\[")
    fired = False
    deadline = time.time() + 1200
    while time.time() < deadline:
        if trigger.search(_read(lognames[0])):
            os.kill(procs[1].pid, signal.SIGTERM)  # ONE rank only
            fired = True
            break
        if all(p.poll() is not None for p in procs):
            break  # both exited before the trigger — report via wait below
        time.sleep(0.2)
    if not fired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        smoke._wait_multihost(procs, logs, lognames, timeout=60)
        raise RuntimeError("epoch-1 trigger never appeared in rank 0's log")
    # Both ranks must stop cooperatively and exit 0 — if the sync protocol
    # failed, rank 1 would die on the signal (default disposition) and
    # rank 0 would hang in a collective until the timeout kills it.
    smoke._wait_multihost(procs, logs, lognames)
    log0 = _read(lognames[0])
    m = re.search(r"preempted at global step (\d+)", log0)
    if not m:
        raise RuntimeError(
            "both ranks exited 0 but no preemption stop was recorded — "
            f"rank 0 log tail:\n{log0[-2000:]}"
        )
    if not os.path.isdir(os.path.join(outdir, "preempt")):
        raise RuntimeError("preempt/ checkpoint directory missing")
    return int(m.group(1))


def _compare(work: str, dir_a: str, dir_b: str) -> dict:
    """smoke's leaf-by-leaf checkpoint diff, in an 8-device subprocess."""
    cmp_json = os.path.join(work, "compare_preempt.json")
    subprocess.run(
        [sys.executable, "-c", smoke._BOOTSTRAP,
         os.path.join("tools", "multihost_smoke.py"),
         "--compare", dir_a, dir_b, "--out", cmp_json],
        cwd=REPO, env=smoke._env(8), check=True, timeout=1200,
    )
    with open(cmp_json) as f:
        return json.load(f)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(REPO, "MULTIHOST_PREEMPT_r03.json")
    )
    ap.add_argument("--workdir", default=None,
                    help="scratch dir (default: a TemporaryDirectory)")
    args = ap.parse_args(argv)

    tmp_ctx = tempfile.TemporaryDirectory() if args.workdir is None else None
    work = args.workdir if args.workdir else tmp_ctx.name
    os.makedirs(work, exist_ok=True)
    ctrl_dir = os.path.join(work, "control")
    pre_dir = os.path.join(work, "preempted")

    print(f"[1/4] control: uninterrupted 2-process run ({EPOCHS} epochs)",
          flush=True)
    smoke._run_multihost(ctrl_dir, epochs=EPOCHS, resume=False,
                         log_prefix=os.path.join(work, "ctrl"))

    print("[2/4] preempt: same run, SIGTERM to rank 1 at epoch 1 — both "
          "ranks must stop at the protocol-agreed step", flush=True)
    stop_step = _preempt_run(pre_dir, os.path.join(work, "pre"))
    print(f"      agreed stop step: {stop_step}", flush=True)

    print("[3/4] resume: both ranks --resume from the preempt checkpoint",
          flush=True)
    smoke._run_multihost(pre_dir, epochs=EPOCHS, resume=True,
                         log_prefix=os.path.join(work, "res"))
    log0 = _read(os.path.join(work, "res.rank0.log"))
    m = re.search(
        r"resumed from preemption checkpoint: epoch (\d+) step (\d+)", log0
    )
    if not m:
        raise RuntimeError(
            "resume did not report the preemption checkpoint — rank 0 log "
            f"tail:\n{log0[-2000:]}"
        )
    resume_epoch, resume_step = int(m.group(1)), int(m.group(2))

    print("[4/4] compare final checkpoints (must be bitwise)", flush=True)
    cmp = _compare(work, ctrl_dir, pre_dir)

    spe = smoke.DATASET_SIZE // smoke.GLOBAL_BATCH
    out = {
        "ok": bool(cmp["bitwise_match"]),
        "n_processes": 2,
        "devices_per_process": 4,
        "epochs": EPOCHS,
        "steps_per_epoch": spe,
        "sigterm_to_rank": 1,
        "sync_protocol": "multihost_utils.reached_preemption_sync_point",
        "stop_step": stop_step,
        "resume_epoch": resume_epoch,
        "resume_step": resume_step,
        "interrupted_vs_uninterrupted": cmp,
    }
    assert resume_epoch * spe + resume_step == stop_step, out
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))
    if tmp_ctx is not None:
        tmp_ctx.cleanup()
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
