#!/usr/bin/env python
"""Dead-rank failure-detection + recovery proof (SURVEY.md §5.3).

The reference's failure mode: "a dead NCCL rank hangs the job" — the
surviving DDP ranks block in allreduce forever and the scheduler's only
recourse is a watchdog kill. This tool demonstrates the TPU-native stack's
bounded detection + elastic recovery, with real processes on CPU:

  1. launch the 2-process × 4-virtual-device ``train.py`` run (gloo
     collectives, per-epoch collective checkpoints);
  2. SIGKILL rank 1 mid-training (simulated hard host failure — no signal
     handler, no goodbye);
  3. the survivor must EXIT NONZERO within a bounded window: the JAX
     coordination service's heartbeat timeout marks the dead task, the
     error propagates, and the distributed client terminates the process
     (measured: ~60 s with default heartbeats) — detection, not a hang;
  4. recovery: a SINGLE-process run (8 virtual devices) ``--resume``s the
     2-process run's last epoch checkpoint — orbax reshards onto the new
     topology — and finishes training. Scale-down restart after a host
     loss needs no surviving state from the dead rank.

Emits DEADRANK_r03.json:
  {ok, detection_latency_s, survivor_exit_code, recovered_epochs, ...}

Run:  python tools/deadrank_probe.py [--out DEADRANK_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import multihost_smoke as smoke  # noqa: E402

EPOCHS = 4


def _kill_run(outdir: str, log_prefix: str) -> tuple:
    """2-rank run; SIGKILL rank 1 once epoch 1 starts; time the survivor's
    death. Returns (survivor_exit_code, detection_latency_s)."""
    procs, logs, lognames = smoke._launch_multihost(
        outdir, epochs=EPOCHS, resume=False, log_prefix=log_prefix
    )
    trigger = re.compile(r"Epoch: \[1\]\[")
    killed_at = None
    deadline = time.time() + 1200

    def epoch_ckpt_durable() -> bool:
        # The collective epoch-0 save is async: the epoch-1 progress print
        # can precede the finalized orbax dir. Killing in that window
        # leaves nothing restorable and the recovery leg would (rightly)
        # refuse to resume — wait for a finalized numeric dir.
        return os.path.isdir(outdir) and any(
            n.isdigit() for n in os.listdir(outdir)
        )

    try:
        while time.time() < deadline:
            text = ""
            if os.path.exists(lognames[0]):
                with open(lognames[0]) as f:
                    text = f.read()
            if trigger.search(text) and epoch_ckpt_durable():
                procs[1].kill()  # SIGKILL: no handler, no shutdown path
                killed_at = time.time()
                break
            if all(p.poll() is not None for p in procs):
                raise RuntimeError("run finished before the kill trigger")
            time.sleep(0.2)
        if killed_at is None:
            raise RuntimeError("epoch-1 trigger never appeared")
        try:
            rc0 = procs[0].wait(timeout=600)
        except subprocess.TimeoutExpired:
            procs[0].kill()
            procs[0].wait()
            raise RuntimeError(
                "survivor HUNG >600 s after peer death — the reference's "
                "failure mode, which this stack is supposed to avoid"
            )
        return rc0, time.time() - killed_at
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()


def _recover_single_process(outdir: str, log_path: str) -> None:
    """Resume the 2-process run's checkpoint with ONE process × 8 virtual
    devices through the real train.py (orbax reshards on restore)."""
    cmd = [
        sys.executable, "-c", smoke._BOOTSTRAP, "train.py",
        *smoke._common_flags(),
        "--epochs", str(EPOCHS),
        "--output-dir", outdir,
        "--resume", outdir,
    ]
    with open(log_path, "w") as log:
        subprocess.run(
            cmd, cwd=REPO, env=smoke._env(8), stdout=log,
            stderr=subprocess.STDOUT, check=True, timeout=1200,
        )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "DEADRANK_r03.json"))
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)

    tmp_ctx = tempfile.TemporaryDirectory() if args.workdir is None else None
    work = args.workdir if args.workdir else tmp_ctx.name
    os.makedirs(work, exist_ok=True)
    outdir = os.path.join(work, "run")

    print("[1/2] 2-process run; SIGKILL rank 1 at epoch 1; survivor must "
          "die detectably, not hang", flush=True)
    rc0, latency = _kill_run(outdir, os.path.join(work, "dr"))
    print(f"      survivor exit code {rc0} after {latency:.1f}s", flush=True)

    print("[2/2] recovery: single-process --resume of the 2-process "
          "checkpoint (orbax reshard), train to completion", flush=True)
    _recover_single_process(outdir, os.path.join(work, "recover.log"))
    with open(os.path.join(work, "recover.log")) as f:
        rec = f.read()
    m = re.search(r"=> resumed from epoch (\d+)", rec)
    epochs_done = len(re.findall(r"^epoch \d+:", rec, re.M))

    out = {
        "ok": rc0 not in (0, None) and latency < 300 and m is not None
        and epochs_done >= 1,
        "n_processes": 2,
        "killed_rank": 1,
        "kill_signal": "SIGKILL",
        "survivor_exit_code": rc0,
        "detection_latency_s": round(latency, 1),
        "detection_mechanism": "coordination-service heartbeat timeout -> "
                               "distributed client terminates the survivor",
        "reference_behavior": "dead NCCL rank hangs the job (SURVEY §5.3)",
        "recovery": {
            "mode": "single-process 8-device --resume of the 2-process "
                    "checkpoint (orbax reshards)",
            "resumed_from_epoch": int(m.group(1)) if m else None,
            "epochs_completed_after_recovery": epochs_done,
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))
    if tmp_ctx is not None:
        tmp_ctx.cleanup()
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
