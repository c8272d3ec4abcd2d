#!/usr/bin/env python
"""Accuracy-recipe integration proof (VERDICT r1 item 9, SURVEY.md §4.5).

Trains mnasnet0_35 @96 on a LEARNABLE synthetic task (class-conditional
oriented gratings + noise, 10 classes) with the full production recipe —
TF-semantics RMSProp (or SGD), label smoothing 0.1, exp/step schedule with
warmup, wd masked off BN/bias, BN EMA 0.9997, bf16 compute — through the
real Trainer/DataLoader stack, and records the per-epoch curve to
CONVERGENCE_r02.json. Guards the recipe plumbing (schedule boundaries, EMA,
wd mask, running-stats eval) that unit tests can't see end-to-end.

Expected: >90% train top-1 within ~8 epochs; val (same distribution, held
out) close behind. Pure-noise memorization is NOT used — a learnable task
also validates that eval-mode BN (running stats) tracks train-mode BN.

Usage:  python tools/train_smoke.py [--optimizer rmsprop] [--epochs 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


class GratingDataset:
    """Class-conditional oriented gratings + heavy noise.

    Class c ∈ [0, n) sets the grating angle (c·180/n degrees) and a mild
    color tint; each sample draws its own phase, frequency jitter, and
    uniform pixel noise. SNR is low enough that the net has to learn real
    filters, high enough to be separable."""

    def __init__(self, length: int, image_size: int, num_classes: int = 10,
                 seed: int = 0, cache: bool = False):
        self.length = length
        self.image_size = image_size
        self.num_classes = num_classes
        self.seed = seed
        self.classes = [f"grating_{i}" for i in range(num_classes)]
        # Samples are deterministic per (seed, index) — identical every
        # epoch — so the uint8 render can be memoized. For the long
        # production-decay rehearsal (hundreds of epochs) the numpy grating
        # synthesis dominates wall clock; caching turns epochs 2..N into
        # pure transform+step time. ~77 KB/image → ~320 MB for 4,096 @128.
        self._cache: dict | None = {} if cache else None

    def __len__(self):
        return self.length

    def load(self, index: int):
        if self._cache is not None:
            hit = self._cache.get(index)
            if hit is not None:
                arr, label = hit
                return Image.fromarray(arr), label
        rng = np.random.default_rng((self.seed, index))
        s = self.image_size + 32
        label = index % self.num_classes
        angle = np.pi * label / self.num_classes
        freq = 2 * np.pi * rng.uniform(4.5, 5.5) / s
        phase = rng.uniform(0, 2 * np.pi)
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        wave = np.sin((np.cos(angle) * xx + np.sin(angle) * yy) * freq + phase)
        tint = 0.25 + 0.5 * np.array([
            np.cos(2 * np.pi * label / self.num_classes) * 0.5 + 0.5,
            np.sin(2 * np.pi * label / self.num_classes) * 0.5 + 0.5,
            0.5,
        ], dtype=np.float32)
        img = 127.5 + 45.0 * wave[..., None] * tint[None, None, :]
        img = img + rng.uniform(-60, 60, (s, s, 3))
        arr = np.clip(img, 0, 255).astype(np.uint8)
        if self._cache is not None:
            self._cache[index] = (arr, label)
        return Image.fromarray(arr), label


def _config_key(args) -> str:
    """Run identity for --state-file safety: everything that changes the
    trajectory (not the bookkeeping knobs)."""
    skip = {"state_file", "chunk_epochs", "json", "workers"}
    return json.dumps({k: v for k, v in sorted(vars(args).items())
                       if k not in skip})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="mnasnet0_35")
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--optimizer", default="rmsprop", choices=["rmsprop", "sgd"])
    ap.add_argument("--lr-schedule", default="cosine")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--train-size", type=int, default=4096)
    ap.add_argument("--val-size", type=int, default=512)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--json", default="CONVERGENCE_r03.json")
    ap.add_argument("--target-top1", type=float, default=90.0)
    ap.add_argument("--model-ema", type=float, default=0.0,
                    help="weight moving average decay (0 = off); when on, "
                         "val_top1 in the curve is the EMA-weights score "
                         "and val_top1_raw carries the raw one")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--bn-momentum", type=float, default=0.9,
                    help="BN running-stat EMA decay. 0.9 (default) converges "
                         "within a ~300-step smoke; 0.9997 is the production "
                         "constant — use with >=2k steps so the eval-mode "
                         "catch-up trajectory is observable "
                         "(CONVERGENCE_r05_prod.json rehearsal)")
    ap.add_argument("--warmup-epochs", type=float, default=1.0)
    ap.add_argument("--bn-recalibrate", action="store_true",
                    help="score eval-mode with exact recalibrated BN stats "
                         "(train/bn_recal.py) at EVERY eval point — recorded "
                         "as val_top1_recal next to the natural-EMA columns, "
                         "proving the remedy snaps eval-mode to train-mode "
                         "long before the 0.9997 EMA catches up naturally. "
                         "Mid-run points recalibrate over a 32-batch slice "
                         "(4k images — moments over ~10^7 elements/channel); "
                         "the final point uses the full train epoch. Stats "
                         "are paired with the params being scored: with "
                         "--model-ema the column recalibrates WITH the EMA "
                         "weights (stats from raw weights mis-normalize the "
                         "EMA model — ADVICE r4)")
    ap.add_argument("--eval-every", type=int, default=1,
                    help="run the (expensive) eval-mode re-scores every N "
                         "epochs — for the long production-decay rehearsal "
                         "(--bn-momentum 0.9997, >=2k steps) where scoring "
                         "val+train each epoch would dominate wall clock; "
                         "the last epoch is always scored")
    ap.add_argument("--state-file", default=None,
                    help="chunked-resume state (pickle of the TrainState "
                         "leaves + curve + wall offset), written after "
                         "every eval point. The axon TPU client leaks host "
                         "memory per device transfer (~20 MB/step at "
                         "128px/bs128 — the r05 12k-step rehearsal's first "
                         "attempt was OOM-killed at 130 GB RSS after 207 "
                         "epochs, dmesg-confirmed), so multi-hour runs must "
                         "be split across process generations; the leak "
                         "dies with each process")
    ap.add_argument("--chunk-epochs", type=int, default=0,
                    help="with --state-file: exit with code 3 after this "
                         "many epochs in THIS process (state saved); the "
                         "caller relaunches until the run completes "
                         "(while python ...; rc=3 loop). Sleep ~20s "
                         "between generations: relaunching within ~15s of "
                         "the previous process's exit was observed (twice, "
                         "r05) to wedge the fresh axon client in futex "
                         "wait before it ever opened a relay connection — "
                         "a teardown race; with the gap, resume is clean")
    ap.add_argument("--train-rescore-size", type=int, default=0,
                    help="cap the eval-mode train-set re-score to the first "
                         "N samples through the EVAL transform (0 = score "
                         "the full train set through the augmented train "
                         "loader, the short-smoke behavior. For long "
                         "rehearsals a 2k-sample clean re-score tracks the "
                         "catch-up trajectory at 1/8 the dispatches)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mnasnet_tpu.utils.backend_probe import apply_jax_platforms_env

    apply_jax_platforms_env()  # let JAX_PLATFORMS=cpu actually mean cpu

    from mnasnet_tpu import create_model
    from mnasnet_tpu.data.pipeline import DataLoader
    from mnasnet_tpu.data.transforms import eval_transform, train_transform
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.schedules import make_schedule
    from mnasnet_tpu.train.trainer import Trainer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # bn_momentum 0.9 (torch's common default), not the production 0.9997:
    # the reference's 0.9997 EMA needs ~10k steps before eval-mode running
    # stats are usable (a 320-step run leaves them ~91% at init → eval-mode
    # collapses BY DESIGN, in torch exactly as here; measured: even 0.99
    # leaves eval at chance after 320 steps because early-training batch
    # stats drift fast). 0.9 converges within ~30 steps so the artifact
    # also proves the train→eval running-stats handoff. --bn-momentum
    # 0.9997 + >=2k steps runs the production-decay rehearsal instead.
    model = create_model(args.arch, num_classes=10, dtype=dtype,
                         bn_momentum=args.bn_momentum, bn_ema="external")

    cache = args.epochs > 16  # long rehearsals re-read every index 100s of times
    train_ds = GratingDataset(args.train_size, args.image_size, seed=1,
                              cache=cache)
    val_ds = GratingDataset(args.val_size, args.image_size, seed=2,
                            cache=cache)
    train_loader = DataLoader(
        train_ds, args.batch_size,
        lambda img, rng: train_transform(img, args.image_size, rng),
        shuffle=True, drop_last=True, seed=0, workers=args.workers,
    )
    val_loader = DataLoader(
        val_ds, args.batch_size,
        lambda img: eval_transform(img, args.image_size),
        shuffle=False, drop_last=False, seed=0, workers=args.workers,
        augment=False,
    )
    if args.train_rescore_size:
        rescore_ds = GratingDataset(
            min(args.train_rescore_size, args.train_size), args.image_size,
            seed=1, cache=cache,  # seed=1 → the same images the train set holds
        )
        rescore_loader = DataLoader(
            rescore_ds, args.batch_size,
            lambda img: eval_transform(img, args.image_size),
            shuffle=False, drop_last=False, seed=0, workers=args.workers,
            augment=False,
        )
    else:
        rescore_loader = train_loader

    steps_per_epoch = train_loader.steps_per_epoch()
    base_lr = 0.016 if args.optimizer == "rmsprop" else 0.1
    schedule = make_schedule(
        args.lr_schedule, base_lr, steps_per_epoch, args.epochs,
        warmup_epochs=args.warmup_epochs,
    )
    tx = create_optimizer(args.optimizer, schedule,
                          model_ema=args.model_ema or None)
    trainer = Trainer(
        model, tx, label_smoothing=0.1, compute_dtype=dtype,
        schedule=schedule, print_freq=10, diagnostics=True,
        grad_accum=args.grad_accum,
    )
    state = trainer.create_state(jax.random.PRNGKey(0), args.image_size)

    def recal_scores(state, num_batches, tag=""):
        """val top-1 with exact recalibrated BN stats, stats paired with the
        params actually scored (raw→raw; EMA→stats recomputed under the EMA
        weights — the ADVICE-r4 pairing). Returns a curve-note dict."""
        from mnasnet_tpu.train.bn_recal import recalibrate_bn

        note = {}
        stats_raw = recalibrate_bn(
            model, state.params, state.batch_stats, train_loader,
            mesh=trainer.mesh, compute_dtype=dtype,
            num_batches=num_batches, verbose=False,
        )
        r1, _, rloss = trainer.validate(
            state.replace(batch_stats=stats_raw), val_loader, verbose=False)
        if args.model_ema:
            from mnasnet_tpu.train.optim import get_ema_params

            ema_params = get_ema_params(state.opt_state)
            stats_ema = recalibrate_bn(
                model, ema_params, state.batch_stats, train_loader,
                mesh=trainer.mesh, compute_dtype=dtype,
                num_batches=num_batches, verbose=False,
            )
            e1, _, eloss = trainer.validate(
                state.replace(batch_stats=stats_ema), val_loader,
                verbose=False, params_override=ema_params,
            )
            # Headline column = the params the headline val_top1 scores
            # (EMA when --model-ema), each with ITS OWN recalibrated stats.
            note = {"val_top1_recal": round(e1, 3),
                    "val_loss_recal": round(eloss, 4),
                    "val_top1_recal_raw": round(r1, 3)}
        else:
            note = {"val_top1_recal": round(r1, 3),
                    "val_loss_recal": round(rloss, 4)}
        print(f"[smoke] bn-recal{tag}: val_top1_recal="
              f"{note['val_top1_recal']:.2f}", flush=True)
        return note

    curve = []
    t0 = time.time()
    start_epoch = 0
    if args.state_file and os.path.exists(args.state_file):
        import pickle

        with open(args.state_file, "rb") as f:
            saved = pickle.load(f)
        assert saved["config_key"] == _config_key(args), (
            "state file was written by a different run config:\n"
            f"  saved: {saved['config_key']}\n  this:  {_config_key(args)}")
        leaves = [jnp.asarray(a) for a in saved["leaves"]]
        state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state), leaves)
        curve = saved["curve"]
        start_epoch = saved["next_epoch"]
        t0 -= saved["wall_seconds"]  # cumulative wall across generations
        print(f"[smoke] resumed at epoch {start_epoch} "
              f"({saved['wall_seconds']:.0f}s accumulated)", flush=True)

    def save_state(next_epoch: int) -> None:
        if not args.state_file:
            return
        import pickle

        import numpy as _np

        payload = {
            "config_key": _config_key(args),
            "leaves": [_np.asarray(x) for x in
                       jax.tree_util.tree_leaves(state)],
            "curve": curve,
            "next_epoch": next_epoch,
            "wall_seconds": time.time() - t0,
        }
        tmp = args.state_file + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, args.state_file)

    def dump_artifact(recal_note: dict, completed: bool) -> dict:
        # Called after EVERY eval point, not just at the end: a long
        # rehearsal killed by a timeout/preemption keeps its curve on disk
        # (the r04 prod rehearsal lost 67 epochs to exactly this).
        # `completed: false` marks the artifact as a partial record whose
        # reached_target reflects only the curve so far.
        final = curve[-1]
        result = {
            **recal_note,
            "task": "class-conditional gratings (10 classes, learnable)",
            "config": {k: v for k, v in vars(args).items() if k != "json"},
            "recipe": {
                "label_smoothing": 0.1, "bn_ema": args.bn_momentum,
                "bn_ema_note": (
                    "production decay (eval-mode stats need ~2-5k steps to "
                    "catch up — the catch-up trajectory is the point of this "
                    "artifact)" if args.bn_momentum >= 0.999 else
                    "production decay is 0.9997; the faster EMA here "
                    "converges within a short smoke (same machinery)"),
                "wd": "1e-5 masked off BN/bias",
                "warmup_epochs": args.warmup_epochs,
                "optimizer_semantics": "TF rmsprop (eps inside sqrt)"
                if args.optimizer == "rmsprop" else "torch sgd+momentum",
            },
            "total_steps": args.epochs * steps_per_epoch,
            "completed": completed,
            "curve": curve,
            # train_top1 is eval-mode over the AUGMENTED train pipeline (RRC
            # can shift the grating scale out of the learned band), so the
            # clean val top-1 also satisfies the target. Under the PRODUCTION
            # BN decay (>= 0.999) the eval-mode catch-up IS the experiment,
            # so the train-mode column may not stand in for it: reached_target
            # then requires the eval-mode val score itself. (The r04 prod
            # rehearsal's first cut let train-mode 100% mask an at-chance
            # eval column — exactly the red-labeled-green artifact class
            # round 3 flagged.)
            "reached_target_evalmode": final["val_top1"] >= args.target_top1,
            # The production remedy's criterion: eval-mode score under EXACT
            # recalibrated statistics (train/bn_recal.py — what train.py
            # --bn-recalibrate deploys). The natural EMA column can plateau
            # below target even after the init retention decays to nothing:
            # the ~1/(1-decay)-step trailing window lags the slow activation-
            # scale drift of late training (weight decay's contraction), a
            # few-percent per-layer variance overestimate that compounds
            # through every BN layer into exponential logit attenuation.
            # tools/bn_forensics.py measures this from the saved state
            # (between-batch share, EMA/pooled ratios, moment-swap controls)
            # — BN_FORENSICS_r05.json; recalibration computes stats AT the
            # current weights, so it has no lag by construction.
            "reached_target_evalmode_recal": (
                final.get("val_top1_recal", -1.0) >= args.target_top1),
            "reached_target": (
                final["val_top1"] >= args.target_top1
                if args.bn_momentum >= 0.999
                else max(final["train_top1"],
                         final["val_top1"]) >= args.target_top1),
            "wall_seconds": round(time.time() - t0, 1),
            "backend": jax.default_backend(),
        }
        tmp = args.json + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
        os.replace(tmp, args.json)
        return result

    epochs_this_process = 0
    for epoch in range(start_epoch, args.epochs):
        state = trainer.train_epoch(state, train_loader, epoch)
        epochs_this_process += 1
        diag = {k: round(v, 4) for k, v in trainer.epoch_diag.items()}
        tstats = {k: round(v, 4) for k, v in trainer.epoch_train_stats.items()}
        if (epoch + 1) % args.eval_every and epoch != args.epochs - 1:
            print(f"[smoke] epoch {epoch}: train_loss={tstats['loss']:.3f} "
                  f"train_top1={tstats['top1']:.2f} (eval skipped) "
                  f"({time.time()-t0:.0f}s)", flush=True)
            continue
        acc1, acc5, vloss = trainer.validate(state, val_loader)
        raw_note = {}
        if args.model_ema:
            from mnasnet_tpu.train.optim import get_ema_params

            raw_note = {"val_top1_raw": round(acc1, 3)}
            acc1, acc5, vloss = trainer.validate(
                state, val_loader, verbose=False,
                params_override=get_ema_params(state.opt_state),
            )
        tr1, tr5, trloss = trainer.validate(state, rescore_loader,
                                            verbose=False)
        recal_cols = {}
        if args.bn_recalibrate and epoch != args.epochs - 1:
            recal_cols = recal_scores(state, num_batches=32,
                                      tag=f" @epoch {epoch}")
        step_now = (epoch + 1) * steps_per_epoch
        curve.append({
            **raw_note,
            **recal_cols,
            "epoch": epoch,
            "step": step_now,
            # Fraction of the BN running stats still carrying the (0, 1)
            # init — decay^steps. Eval-mode scores cannot be trusted until
            # this is ≪ 1 (it compounds through ~50 BN layers); at the
            # production decay 0.9997 that takes ~10-15k steps, which is
            # the physics the prod rehearsal exists to demonstrate.
            "bn_init_retention": round(args.bn_momentum ** step_now, 6),
            # Training-mode curve (batch-stats BN): the honest optimization
            # trajectory — this is what must stay O(ln C) early.
            "train_loss": tstats["loss"], "train_top1": tstats["top1"],
            # Eval-mode re-scores (running-stats BN): lag the weights by the
            # EMA horizon — see the bn_ema_note in the recipe block.
            "train_top1_evalmode": round(tr1, 3),
            "train_loss_evalmode": round(trloss, 4),
            "val_top1": round(acc1, 3), "val_loss": round(vloss, 4),
            "lr": float(schedule((epoch + 1) * steps_per_epoch)),
            **diag,
        })
        print(f"[smoke] epoch {epoch}: train_loss={tstats['loss']:.3f} "
              f"train_top1={tstats['top1']:.2f} val_top1={acc1:.2f} "
              f"max|logit|={diag.get('max_max_abs_logit', 0):.1f} "
              f"gnorm={diag.get('max_grad_norm', 0):.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        dump_artifact({}, completed=False)
        save_state(epoch + 1)
        if (args.chunk_epochs and epoch != args.epochs - 1
                and epochs_this_process >= args.chunk_epochs):
            print(f"[smoke] chunk boundary at epoch {epoch}: state saved, "
                  f"exiting 3 for relaunch (host-leak reset)", flush=True)
            sys.exit(3)

    recal_note = {}
    if args.bn_recalibrate:
        # Final point: full-epoch exact recal (mid-run points used a
        # 32-batch slice). Folded into the last curve row so the artifact's
        # recal column is complete, and surfaced at top level too.
        recal_note = recal_scores(state, num_batches=None, tag=" (final)")
        curve[-1].update(recal_note)
    final = curve[-1]
    result = dump_artifact(recal_note, completed=True)
    print(json.dumps({k: result[k] for k in
                      ("reached_target", "wall_seconds")}))
    print(f"wrote {args.json}: final train_top1={final['train_top1']} "
          f"val_top1={final['val_top1']}")
    if not result["reached_target"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
