#!/usr/bin/env python
"""Restart supervisor: the elastic-recovery loop, automated.

The proven recovery pieces — bounded dead-rank detection
(DEADRANK_r03.json), step-exact preemption checkpoints, topology-elastic
orbax restore — still need something to do the restarting. The reference
era used shell `while ! python train.py; do ...` loops that restarted from
scratch; this supervisor restarts **from the latest checkpoint**:

  python tools/supervise.py [--max-restarts N] -- <train.py args...>

Behavior:
  * runs ``python train.py <args>`` as a child (line-buffered passthrough);
  * exit 0 → done; exit nonzero (dead peer detected, OOM, infra error) →
    relaunch, appending ``--resume OUTPUT_DIR`` once a restorable
    checkpoint exists there (an epoch dir or preempt/) — never before,
    since train.py refuses --resume with nothing to restore;
  * SIGTERM/SIGINT to the supervisor forwards to the child (so platform
    preemption still reaches train.py's --on-preempt machinery) and stops
    the restart loop: a preemption is a scheduled stop, not a failure to
    retry;
  * gives up after --max-restarts consecutive sub-60s failures (crash
    loop), but resets the counter whenever an attempt survives past 60 s.

Exit code: the last child's. Driven end-to-end in
tests/test_supervise.py (unit) and the RUN_SLOW integration drive.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_output_dir(train_args: list) -> str:
    """train.py's --output-dir (or its default 'checkpoints')."""
    for i, a in enumerate(train_args):
        if a == "--output-dir" and i + 1 < len(train_args):
            return train_args[i + 1]
        if a.startswith("--output-dir="):
            return a.split("=", 1)[1]
    return "checkpoints"


def has_checkpoint(outdir: str) -> bool:
    """True iff train.py --resume outdir would find something restorable:
    a numeric epoch/step directory or a preempt/ checkpoint."""
    if not os.path.isdir(outdir):
        return False
    for name in os.listdir(outdir):
        if name.isdigit():
            return True
    pre = os.path.join(outdir, "preempt")
    return os.path.isdir(pre) and any(
        n.isdigit() for n in os.listdir(pre)
    )


# The axon sitecustomize pins the TPU platform at interpreter start, so a
# child's JAX_PLATFORMS env var would be SILENTLY IGNORED (verify-skill
# gotcha). When the supervisor's env requests a platform, launch the child
# through this bootstrap so the request actually takes effect.
_BOOTSTRAP = (
    "import sys, runpy, jax; "
    "jax.config.update('jax_platforms', sys.argv.pop(1)); "
    "script = sys.argv.pop(1); "
    "runpy.run_path(script, run_name='__main__')"
)


def build_cmd(train_args: list, outdir: str) -> list:
    """Child argv; appends --resume outdir when restorable and the caller
    didn't already pass a --resume."""
    train_py = os.path.join(REPO, "train.py")
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        cmd = [sys.executable, "-c", _BOOTSTRAP, plat, train_py,
               *train_args]
    else:
        cmd = [sys.executable, train_py, *train_args]
    already = any(
        a == "--resume" or a.startswith("--resume=") for a in train_args
    )
    if not already and has_checkpoint(outdir):
        cmd += ["--resume", outdir]
    return cmd


def main(argv=None):
    ap = argparse.ArgumentParser(
        usage="supervise.py [--max-restarts N] -- <train.py args...>"
    )
    ap.add_argument("--max-restarts", type=int, default=10,
                    help="consecutive fast (<60 s) failures before giving "
                         "up (a surviving attempt resets the counter)")
    if argv is None:
        argv = sys.argv[1:]
    if "--" in argv:
        sep = argv.index("--")
        own, train_args = argv[:sep], argv[sep + 1:]
    else:
        own, train_args = [], list(argv)
    args = ap.parse_args(own)
    if not train_args:
        ap.error("no train.py arguments after --")

    outdir = parse_output_dir(train_args)
    stop = {"flag": False}
    child = {"proc": None}

    def forward(signum, frame):
        stop["flag"] = True
        p = child["proc"]
        if p is not None and p.poll() is None:
            p.send_signal(signum)  # reaches train.py's --on-preempt path

    signal.signal(signal.SIGTERM, forward)
    signal.signal(signal.SIGINT, forward)

    fast_failures = 0
    attempt = 0
    rc = None
    while True:
        if stop["flag"]:
            # SIGTERM can land in the window between a child's exit and
            # the next launch — honoring it only via the forward() signal
            # path would let a fresh child train on, oblivious to the
            # platform's preemption notice.
            print("[supervise] stop requested — not launching a new "
                  "attempt", flush=True)
            return rc if rc is not None else 128 + signal.SIGTERM
        attempt += 1
        cmd = build_cmd(train_args, outdir)
        print(f"[supervise] attempt {attempt}: {' '.join(cmd[1:])}",
              flush=True)
        t0 = time.time()
        child["proc"] = subprocess.Popen(cmd)
        print(f"[supervise] child pid {child['proc'].pid}", flush=True)
        rc = child["proc"].wait()
        elapsed = time.time() - t0
        if rc == 0:
            print(f"[supervise] attempt {attempt} completed", flush=True)
            return 0
        if stop["flag"]:
            print(f"[supervise] stop requested; child exited {rc} — not "
                  "restarting (preemption is a scheduled stop)", flush=True)
            return rc
        fast_failures = fast_failures + 1 if elapsed < 60 else 0
        if fast_failures >= args.max_restarts:
            print(f"[supervise] {fast_failures} consecutive fast failures "
                  f"(crash loop) — giving up with exit {rc}", flush=True)
            return rc
        print(f"[supervise] attempt {attempt} exited {rc} after "
              f"{elapsed:.0f}s — restarting"
              f"{' from checkpoint' if has_checkpoint(outdir) else ''}",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
