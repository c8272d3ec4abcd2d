#!/usr/bin/env python
"""ImageNet training CLI — the reference's ``train.py`` surface (SURVEY.md
§5.6 canonical flag set) on the TPU-native stack.

Usage (real data):
    python train.py DATA_DIR --arch mnasnet1_0 --batch-size 256 ...
Usage (no dataset in env):
    python train.py --synthetic --arch mnasnet0_5 --image-size 64 ...

The reference's multiprocessing-distributed flags collapse into nothing here:
the device mesh covers all local chips automatically, and multi-host runs
initialize via ``jax.distributed.initialize()`` (SURVEY.md §2.6).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="MNASNet TPU ImageNet training",
        epilog="Env: MNASNET_TPU_XLA_OPTIONS overrides the tuned XLA:TPU "
        "compile options attached to the train/eval steps ('none' disables; "
        "a JSON dict replaces them — see mnasnet_tpu/utils/xla_options.py).",
    )
    p.add_argument("data", nargs="?", default=None,
                   help="path to dataset root (train/ and val/ subdirs)")
    p.add_argument("-a", "--arch", default="mnasnet1_0",
                   help="model architecture (mnasnet0_35/0_5/0_75/1_0/1_3/1_4, or any "
                        "mnasnet<int>_<frac> multiplier spelling)")
    p.add_argument("--workers", type=int, default=4,
                   help="data loading worker threads")
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("-b", "--batch-size", type=int, default=256,
                   help="global batch size across all devices")
    p.add_argument("--lr", "--learning-rate", type=float, default=None,
                   dest="lr", help="base LR (default: optimizer-specific)")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", "--weight-decay", type=float, default=1e-5,
                   dest="weight_decay")
    p.add_argument("-p", "--print-freq", type=int, default=10)
    p.add_argument("--resume", default="", help="resume from checkpoint dir")
    p.add_argument("-e", "--evaluate", action="store_true")
    p.add_argument("--pretrained", nargs="?", const="__auto__", default="",
                   help="path to a converted-or-torch checkpoint to load; "
                        "bare --pretrained (reference boolean form) looks for "
                        "$MNASNET_PRETRAINED_DIR/<arch>.pth")
    p.add_argument("--seed", type=int, default=None)
    # --- reference CLI-contract compatibility (SURVEY.md §5.6) ---
    # Accepted so reference launch scripts run unchanged; distribution is
    # automatic here (mesh over local chips; multi-host via
    # jax.distributed.initialize in the launcher), so these only validate.
    p.add_argument("--world-size", type=int, default=-1,
                   help="[compat] checked against jax.process_count()")
    p.add_argument("--rank", type=int, default=-1,
                   help="[compat] checked against jax.process_index()")
    p.add_argument("--dist-url", default=None,
                   help="coordinator address for multi-host runs: with "
                        "--world-size > 1 it is passed to "
                        "jax.distributed.initialize (which BLOCKS until all "
                        "processes join); leave unset for single-host")
    p.add_argument("--dist-backend", default="ici",
                   help="[compat] collectives always ride ICI/DCN via XLA")
    p.add_argument("--gpu", type=int, default=None,
                   help="[compat] single-device pinning is not applicable")
    p.add_argument("--multiprocessing-distributed", action="store_true",
                   help="[compat] ignored — sharding covers all chips")
    # --- recipe knobs implied by the rebuild contract [B:north_star] ---
    p.add_argument("--optimizer", choices=["sgd", "rmsprop"], default="rmsprop")
    p.add_argument("--lr-schedule", choices=["step", "cosine", "exp", "constant"],
                   default="step")
    p.add_argument("--warmup-epochs", type=float, default=0.0)
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--fused-kernels", choices=["auto", "pallas", "xla"],
                   default="auto", help="depthwise conv implementation")
    p.add_argument("--bn-stats", choices=["one_pass", "two_pass"],
                   default="one_pass",
                   help="BN batch-statistics formulation: one_pass is +17%% "
                        "train step on v5e; two_pass is bitwise cross-mesh "
                        "exact")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize MBConv blocks (saves activation HBM "
                        "at ~11%% step-time cost on v5e; for memory-bound "
                        "configs)")
    p.add_argument("--model-ema", type=float, default=0.0, metavar="DECAY",
                   help="maintain a weight moving average with this decay "
                        "and evaluate/track-best on it (the TF MnasNet "
                        "recipe's moving_average_decay=0.9999, with the "
                        "num_updates warmup ramp); 0 disables")
    p.add_argument("--grad-accum", type=int, default=0, metavar="K",
                   help="accumulate gradients over K sequential microbatches "
                        "inside one compiled step (one optimizer update per "
                        "--batch-size samples; activation memory scales with "
                        "batch-size/K). Per-microbatch BN statistics, like "
                        "DDP; requires --batch-size divisible by K and "
                        "--fused-updates (external BN EMA). 0 (default) = "
                        "auto: on TPU, pick the smallest K keeping the "
                        "per-chip microbatch ≤128 — the measured conv-"
                        "emitter cliff where accum2 beats the direct bs256 "
                        "step by 11%% (ACCUM_OVERHEAD_r04.json); 1 forces "
                        "the direct step")
    p.add_argument("--on-preempt", choices=["save", "ignore"], default="save",
                   help="SIGTERM behavior (TPU-pod maintenance/preemption "
                        "events): 'save' finishes the in-flight step, writes "
                        "a preemption checkpoint (collective — the platform "
                        "signals every host) and exits cleanly; --resume "
                        "then continues at the exact step, bitwise-identical "
                        "to an uninterrupted run. 'ignore' keeps the default "
                        "kill behavior")
    p.add_argument("--fused-updates", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fused small-tensor update paths (default on): the "
                        "~100 per-channel BN/bias leaves update through "
                        "packed flat vectors and the BN running-stat EMA is "
                        "applied once over the flattened stats tree — "
                        "elementwise-identical math, fewer tiny XLA ops "
                        "(BASELINE.md)")
    p.add_argument("--stem-s2d", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="space-to-depth stem lowering (exact rewrite of the "
                        "3x3/s2 RGB conv as 2x2/s1 on (H/2,W/2,12); same "
                        "checkpoint layout)")
    p.add_argument("--bn-recalibrate", type=int, default=0, metavar="N",
                   help="after training, recompute the BN running stats as "
                        "EXACT pooled statistics over N train batches with "
                        "frozen weights (0 = off; the SWA update_bn / "
                        "stats-refresh pass, train/bn_recal.py), then "
                        "re-validate and save. With the production BN EMA "
                        "decay 0.9997 the running stats lag the weights by "
                        "a ~3.3k-step horizon — short runs, fine-tunes and "
                        "fresh-stats restores should recalibrate")
    p.add_argument("--output-dir", default="./checkpoints")
    p.add_argument("--save-freq-steps", type=int, default=0,
                   help="also checkpoint every N steps (0 = epoch-only, the "
                        "reference's cadence)")
    p.add_argument("--mesh-dcn", type=int, default=1,
                   help="multi-slice data parallelism: number of slices in "
                        "the device mesh (batch shards over dcn x data; "
                        "gradient reduction is hierarchical — ICI within a "
                        "slice, DCN across). Requires --sync-bn (default)")
    p.add_argument("--sync-bn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="global BN stats across devices (default); "
                        "--no-sync-bn uses per-device batch stats like the "
                        "reference's DDP (shard_map path)")
    p.add_argument("--scale-lr", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="linear batch-size LR scaling (lr * batch/256); "
                        "default: applied only to the optimizer-default LR, "
                        "never to an explicit --lr")
    p.add_argument("--deterministic", action="store_true",
                   help="bit-reproducible runs: seed=0 unless --seed given, "
                        "two-pass BN stats (bitwise cross-mesh exact)")
    # --- env-specific ---
    p.add_argument("--decoder", choices=["pil", "native", "native-fast"],
                   default="native-fast",
                   help="JPEG path: PIL, native fused decoder (strict PIL "
                        "parity), or native with DCT-scaled decode (fastest); "
                        "native falls back to PIL if the C++ build is "
                        "unavailable")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic FakeData (no dataset required)")
    p.add_argument("--synthetic-size", type=int, default=1024,
                   help="samples per synthetic epoch")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--freeze-backbone", action="store_true",
                   help="train only the classifier head (linear probe): "
                        "backbone parameter updates are zeroed; BN running "
                        "stats still update in training mode (torch "
                        "requires_grad=False semantics). Pair with "
                        "--pretrained + --num-classes for transfer learning")
    p.add_argument("--profile-steps", default="",
                   help="N:M — jax.profiler trace of train steps N..M (epoch 0)")
    p.add_argument("--tensorboard", default="",
                   help="TensorBoard log dir (empty = off)")
    p.add_argument("--compilation-cache", default=None, metavar="DIR",
                   help="persistent XLA compile cache dir (restarts/resumes "
                        "skip the 20-40s step compile); default: "
                        "$MNASNET_TPU_COMPILATION_CACHE or off")
    args = p.parse_args(argv)
    # Reference-boolean `--pretrained` placed before the positional makes
    # argparse greedily consume DATA_DIR as the flag's value. Undo that:
    # a value that is an existing directory (not a weights file) was meant
    # to be the dataset root.
    if (args.data is None and args.pretrained
            and args.pretrained != "__auto__"
            and not args.pretrained.endswith((".pth", ".pth.tar", ".pt",
                                              ".npz"))
            and os.path.isdir(args.pretrained)):
        args.data, args.pretrained = args.pretrained, "__auto__"
    if args.deterministic:
        if args.seed is None:
            args.seed = 0
        # two-pass BN batch statistics are bitwise identical across mesh
        # shapes (one-pass regroups the reduction); pin them for bit-repro.
        args.bn_stats = "two_pass"
    return args


def maybe_init_distributed(args) -> None:
    """Multi-host bootstrap (SURVEY.md §2.6): the reference's
    ``init_process_group(dist_url, world_size, rank)`` maps directly onto
    ``jax.distributed.initialize``. Also honors the standard JAX coordinator
    env vars so TPU-pod launchers work without flags."""
    import jax

    if args.dist_url and args.world_size > 1:
        addr = args.dist_url
        for prefix in ("tcp://", "env://"):
            addr = addr.removeprefix(prefix)
        jax.distributed.initialize(
            coordinator_address=addr or None,
            num_processes=args.world_size,
            process_id=args.rank if args.rank >= 0 else None,
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def _check_preempt_meta(pre_dir: str, spe: int) -> None:
    """The preempt checkpoint key is in global-STEP units: divmod is only
    meaningful with the same steps_per_epoch the interrupted run had, so
    meta.json pins it and a mismatched resume (different --batch-size or
    dataset) is refused. A missing/unreadable meta (old checkpoint, or a
    torn write when a hard kill landed mid-dump) skips the check with a
    warning rather than crashing the resume — the checkpoint itself is
    orbax-atomic and valid."""
    import sys

    meta_path = os.path.join(pre_dir, "meta.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        saved_spe = meta["steps_per_epoch"]
    except FileNotFoundError:
        return
    except (json.JSONDecodeError, KeyError, OSError, TypeError) as e:
        print(f"WARNING: unreadable {meta_path} ({e!r}) — skipping the "
              "steps-per-epoch consistency check; make sure this resume "
              "uses the interrupted run's batch size and dataset",
              file=sys.stderr, flush=True)
        return
    if saved_spe != spe:
        raise SystemExit(
            f"preemption checkpoint {pre_dir} was written with "
            f"steps_per_epoch={saved_spe} (global batch "
            f"{meta.get('global_batch', '?')}); this invocation has "
            f"steps_per_epoch={spe}. Mid-epoch resume needs the same "
            "batch size and dataset — rerun with the original settings."
        )


def resolve_auto_grad_accum(batch_size: int, batch_shards: int,
                            backend: str, *, sync_bn: bool,
                            fused_updates: bool) -> int:
    """``--grad-accum 0`` (auto) resolution: keep the per-chip microbatch
    ≤128 — the measured conv-emitter cliff where accumulating bs128
    microbatches beats the direct step by 11% at global batch 256
    (ACCUM_OVERHEAD_r04.json; selection math in
    train/steps.auto_grad_accum). Only on TPU backends (the cliff is this
    backend's physics) and only when the accum prerequisites hold: a user
    who explicitly disabled sync-bn / fused-updates gets the direct step."""
    from mnasnet_tpu.train.steps import auto_grad_accum

    if (backend in ("tpu", "axon") and sync_bn and fused_updates
            and batch_size % batch_shards == 0):
        return auto_grad_accum(batch_size // batch_shards)
    return 1


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mnasnet_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache)
    maybe_init_distributed(args)

    seed = args.seed if args.seed is not None else int(time.time()) % (2**31)
    if args.seed is None and jax.process_count() > 1:
        # Hosts can land on different seconds; shard_indices' contract needs
        # an identical shuffle permutation everywhere (ADVICE r1).
        import numpy as np
        from jax.experimental import multihost_utils

        seed = int(multihost_utils.broadcast_one_to_all(np.int32(seed)))

    from mnasnet_tpu import create_model
    from mnasnet_tpu.data.dataset import ImageFolderDataset, SyntheticDataset
    from mnasnet_tpu.data.pipeline import DataLoader
    from mnasnet_tpu.data.transforms import eval_transform, train_transform
    from mnasnet_tpu.parallel.mesh import make_mesh
    from mnasnet_tpu.train.checkpoint import CheckpointManager
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.schedules import make_schedule, scale_lr_for_batch
    from mnasnet_tpu.train.trainer import Trainer

    if args.world_size not in (-1, jax.process_count()):
        raise SystemExit(
            f"--world-size {args.world_size} != jax.process_count() "
            f"{jax.process_count()}; launch with jax.distributed.initialize()"
        )
    if args.rank not in (-1, jax.process_index()):
        raise SystemExit(
            f"--rank {args.rank} != jax.process_index() {jax.process_index()}"
        )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = create_model(
        args.arch,
        num_classes=args.num_classes,
        dtype=dtype,
        dw_impl=args.fused_kernels,
        remat=args.remat,
        bn_stats=args.bn_stats,
        bn_ema="external" if args.fused_updates else "module",
        stem_s2d=args.stem_s2d,
    )

    # ---- data -------------------------------------------------------------
    shard_id, num_shards = jax.process_index(), jax.process_count()
    if args.synthetic:
        train_ds = SyntheticDataset(args.synthetic_size, args.image_size,
                                    args.num_classes, seed=seed)
        val_ds = SyntheticDataset(max(args.synthetic_size // 4, args.batch_size),
                                  args.image_size, args.num_classes, seed=seed + 1)
    else:
        if not args.data:
            raise SystemExit("DATA_DIR required unless --synthetic")
        train_ds = ImageFolderDataset(os.path.join(args.data, "train"))
        val_ds = ImageFolderDataset(os.path.join(args.data, "val"))

    train_bytes_tf = val_bytes_tf = None
    if args.decoder != "pil":
        from mnasnet_tpu.data import native_decoder

        if native_decoder.available():
            fast = args.decoder == "native-fast"
            train_bytes_tf = (
                lambda data, rng: native_decoder.decode_train(
                    data, args.image_size, rng, fast=fast)
            )
            val_bytes_tf = (
                lambda data: native_decoder.decode_eval(
                    data, args.image_size, fast=fast)
            )
        else:
            print("warning: native decoder unavailable, using PIL", flush=True)

    host_batch = args.batch_size // num_shards
    train_loader = DataLoader(
        train_ds, host_batch,
        lambda img, rng: train_transform(img, args.image_size, rng),
        shuffle=True, drop_last=True, seed=seed, workers=args.workers,
        shard_id=shard_id, num_shards=num_shards,
        bytes_transform=train_bytes_tf,
    )
    val_loader = DataLoader(
        val_ds, host_batch,
        lambda img: eval_transform(img, args.image_size),
        shuffle=False, drop_last=False, seed=seed, workers=args.workers,
        shard_id=shard_id, num_shards=num_shards, augment=False,
        bytes_transform=val_bytes_tf,
    )

    # ---- optimizer + schedule --------------------------------------------
    steps_per_epoch = train_loader.steps_per_epoch()
    base_lr = args.lr
    if base_lr is None:
        base_lr = 0.1 if args.optimizer == "sgd" else 0.016
        scale = args.scale_lr is not False  # default LR scales unless --no-scale-lr
    else:
        # An explicit --lr is the literal base LR (reference CLI semantics);
        # scale it only on explicit --scale-lr.
        scale = args.scale_lr is True
    if scale:
        base_lr = scale_lr_for_batch(base_lr, args.batch_size)
    schedule = make_schedule(
        args.lr_schedule, base_lr, steps_per_epoch, args.epochs,
        warmup_epochs=args.warmup_epochs,
    )
    frozen_mask = None
    if args.freeze_backbone:
        from mnasnet_tpu.train.optim import backbone_frozen_mask

        frozen_mask = backbone_frozen_mask
        print("=> --freeze-backbone: only the classifier head trains "
              "(BN running stats still update)")
    tx = create_optimizer(
        args.optimizer, schedule,
        momentum=args.momentum, weight_decay=args.weight_decay,
        fused="small" if args.fused_updates else False,
        model_ema=args.model_ema or None,
        frozen_mask=frozen_mask,
    )

    writer = None
    if args.tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(args.tensorboard)

    step_tracer = None
    if args.profile_steps:
        from mnasnet_tpu.utils.profiling import StepTracer, parse_profile_steps

        lo, hi = parse_profile_steps(args.profile_steps)
        step_tracer = StepTracer(
            os.path.join(args.output_dir, "profile"), lo, hi
        )

    if args.mesh_dcn > 1 and not args.sync_bn:
        raise SystemExit("--mesh-dcn requires --sync-bn (local-BN shards "
                         "only over 'data')")
    if args.grad_accum > 1:
        if not args.sync_bn:
            raise SystemExit("--grad-accum already uses per-microbatch BN; "
                             "drop --no-sync-bn")
        if not args.fused_updates:
            raise SystemExit("--grad-accum requires --fused-updates "
                             "(external BN EMA: one EMA per optimizer update)")
        if args.batch_size % args.grad_accum:
            raise SystemExit(f"--batch-size {args.batch_size} not divisible "
                             f"by --grad-accum {args.grad_accum}")
    mesh = make_mesh(dcn=args.mesh_dcn)
    if args.grad_accum == 0:
        batch_shards = mesh.shape["data"] * mesh.shape.get("dcn", 1)
        args.grad_accum = resolve_auto_grad_accum(
            args.batch_size, batch_shards, jax.default_backend(),
            sync_bn=args.sync_bn, fused_updates=args.fused_updates,
        )
        if args.grad_accum > 1 and jax.process_index() == 0:
            print(f"=> --grad-accum auto: per-chip batch "
                  f"{args.batch_size // batch_shards} > 128 — accumulating "
                  f"over {args.grad_accum} microbatches (measured +11% at "
                  f"global 256 vs the direct step; --grad-accum 1 forces "
                  f"direct)", flush=True)
    elif args.grad_accum < 0:
        raise SystemExit(f"--grad-accum {args.grad_accum} invalid "
                         "(0 = auto, >=1 explicit)")
    trainer = Trainer(
        model, tx, mesh=mesh, label_smoothing=args.label_smoothing,
        compute_dtype=dtype, schedule=schedule, print_freq=args.print_freq,
        writer=writer, step_tracer=step_tracer, sync_bn=args.sync_bn,
        grad_accum=args.grad_accum,
        preempt_sync=args.on_preempt == "save",
    )
    state = trainer.create_state(jax.random.PRNGKey(seed), args.image_size)

    if args.pretrained:
        import jax.numpy as jnp_
        from mnasnet_tpu.convert.torch_converter import torch_to_flax
        from mnasnet_tpu.pretrained import load_state_dict_file

        alpha = model.alpha
        if args.pretrained == "__auto__":
            # Reference boolean form (--pretrained with no path). No network
            # in the TPU env, so resolve against a local weights directory.
            pdir = os.environ.get("MNASNET_PRETRAINED_DIR", "./pretrained")
            for ext in (".pth", ".pth.tar", ".pt", ".npz"):
                cand = os.path.join(pdir, args.arch + ext)
                if os.path.exists(cand):
                    args.pretrained = cand
                    break
            else:
                raise SystemExit(
                    f"--pretrained: no {args.arch}.pth under {pdir} "
                    "(set MNASNET_PRETRAINED_DIR or pass an explicit path)"
                )
        try:
            # One loading implementation for the whole framework
            # (pretrained.py): torch .pth/.pth.tar/.pt pickles or converted
            # .npz arrays, module. prefixes stripped.
            sd = load_state_dict_file(args.pretrained)
        except ValueError as e:
            raise SystemExit(f"--pretrained: {e}")
        variables = torch_to_flax(sd, alpha)
        new_params = jax.tree.map(jnp_.asarray, variables["params"])
        ckpt_classes = int(new_params["classifier"]["kernel"].shape[-1])
        if ckpt_classes != args.num_classes:
            # Transfer learning: backbone from the checkpoint, classifier
            # kept at its fresh initialization (torch lineage: swap the
            # final Linear after load_state_dict).
            new_params = dict(new_params)
            new_params["classifier"] = state.params["classifier"]
            print(f"=> checkpoint classifier has {ckpt_classes} classes, "
                  f"model has {args.num_classes}: transfer-learning load "
                  "(backbone from checkpoint, classifier freshly "
                  "initialized)")
        state = state.replace(
            params=new_params,
            batch_stats=jax.tree.map(jnp_.asarray, variables["batch_stats"]),
        )
        print(f"=> loaded pretrained weights from {args.pretrained}")

    mgr = CheckpointManager(os.path.abspath(args.output_dir))
    best_acc1, start_epoch, start_step = 0.0, args.start_epoch, 0
    restored_any = False
    if args.resume:
        rmgr = (mgr if os.path.abspath(args.resume) == os.path.abspath(args.output_dir)
                else CheckpointManager(os.path.abspath(args.resume)))
        try:
            state, start_epoch, best_acc1 = rmgr.restore(state)
            restored_any = True
        except FileNotFoundError:
            # No epoch checkpoint yet — legal when the run was preempted
            # inside its very first epoch (only preempt/ exists); the
            # restored_any check below still aborts if preempt/ is
            # missing too (e.g. a mistyped --resume path must not
            # silently train from scratch).
            pass
        except (ValueError, KeyError) as e:
            # The optimizer-state layout depends on --optimizer and
            # --fused-updates; a template built with different flags than
            # the original run fails structure matching deep inside orbax.
            raise SystemExit(
                f"--resume: checkpoint structure does not match the current "
                f"flags (optimizer={args.optimizer}, "
                f"fused-updates={args.fused_updates}). Re-run with the same "
                f"--optimizer and --fused-updates/--no-fused-updates the "
                f"checkpoint was written with. Original error: {e}"
            ) from e
        else:
            print(f"=> resumed from epoch {start_epoch - 1} "
                  f"(best acc1 {best_acc1:.3f})")
        # A preemption checkpoint (--on-preempt save) that is NEWER than the
        # last completed epoch wins: resume mid-epoch at the exact step (the
        # loader skips the consumed batches without decoding them).
        pre_dir = os.path.join(os.path.abspath(args.resume), "preempt")
        if os.path.isdir(pre_dir):
            spe = train_loader.steps_per_epoch()
            pmgr = CheckpointManager(pre_dir, max_to_keep=1, track_best=False)
            try:
                gstep = pmgr.latest_epoch()  # key = next global step to run
                # >= (not >): a preemption before the very first optimizer
                # step writes key 0, and `0 > 0` would refuse the only
                # checkpoint the run has (bricking supervised restarts).
                # Mid-epoch keys always have gstep % spe != 0, so a STALE
                # preempt entry from an earlier, already-resumed
                # interruption still loses to the epoch checkpoint here.
                if gstep is not None and gstep >= start_epoch * spe:
                    # Consistency check only when the preempt checkpoint is
                    # actually used — a stale entry must not block a legal
                    # epoch-granular resume with a changed batch size.
                    _check_preempt_meta(pre_dir, spe)
                    state, _, best_acc1 = pmgr.restore(state, epoch=gstep)
                    restored_any = True
                    start_epoch, start_step = divmod(gstep, spe)
                    print(f"=> resumed from preemption checkpoint: epoch "
                          f"{start_epoch} step {start_step} "
                          f"(global step {gstep})")
            finally:
                pmgr.close()
        if not restored_any:
            raise SystemExit(
                f"--resume {args.resume}: no checkpoint found (neither an "
                "epoch checkpoint nor preempt/) — refusing to silently "
                "train from scratch"
            )

    if args.evaluate:
        trainer.validate(state, val_loader)
        return

    # NOTE: orbax saves of mesh-sharded arrays are COLLECTIVE — every
    # process must call save() (orbax does the rank-0 write coordination
    # itself); gating save behind process_index()==0 would deadlock
    # multi-host runs at the first checkpoint. Only the print is rank-0.
    if args.on_preempt == "save" and jax.process_count() == 1:
        # Single-process: a Python SIGTERM handler requests the stop.
        # Multi-host, installing one would REPLACE TSL's preemption
        # notifier (one OS handler per signal); there the trainer instead
        # polls reached_preemption_sync_point every step, so all hosts
        # stop at the same agreed step (no collective deadlock).
        import signal

        def _on_sigterm(signum, frame):
            # Event.set + os.write only: print() from a signal handler can
            # hit CPython's buffered-stdout reentrancy guard (RuntimeError:
            # reentrant call) if the signal lands inside the main thread's
            # own print — which would crash the run BEFORE the preempt
            # checkpoint it exists to write.
            trainer.request_stop()
            os.write(2, b"=> SIGTERM: finishing the in-flight step, then "
                        b"saving a preemption checkpoint...\n")

        signal.signal(signal.SIGTERM, _on_sigterm)

    step_cb, step_mgr = None, None
    if args.save_freq_steps > 0:
        step_mgr = CheckpointManager(
            os.path.abspath(os.path.join(args.output_dir, "steps")),
            max_to_keep=2, track_best=False,
        )

        def step_cb(state, global_step):
            step_mgr.save(global_step, state, acc1=0.0, best_acc1=best_acc1)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.perf_counter()
        state = trainer.train_epoch(
            state, train_loader, epoch,
            step_callback=step_cb, step_callback_freq=args.save_freq_steps,
            start_step=start_step,
        )
        start_step = 0
        if trainer.stopped_early:
            spe = train_loader.steps_per_epoch()
            if trainer.next_global_step == (epoch + 1) * spe:
                # The stop registered at the epoch boundary — every batch of
                # this epoch ran. Write the normal epoch checkpoint (so
                # eval/--resume/export see the finished epoch instead of
                # only a preempt/ entry) and skip validate: the preemption
                # grace window is for saving state, not scoring it. The one
                # loss is this epoch's metric/best-tracking, noted below.
                mgr.save(epoch, state, acc1=0.0, best_acc1=best_acc1,
                         wait=True)
                if jax.process_index() == 0:
                    print(f"=> preempted at the epoch-{epoch} boundary; "
                          f"epoch checkpoint saved (validate skipped). "
                          f"Continue with: --resume {args.output_dir}",
                          flush=True)
            else:
                # NOTE: this save is collective too (every preempted
                # process calls it); the checkpoint key is the next global
                # step to run.
                pdir = os.path.join(os.path.abspath(args.output_dir),
                                    "preempt")
                pmgr = CheckpointManager(pdir, max_to_keep=1,
                                         track_best=False)
                pmgr.save(trainer.next_global_step, state, acc1=0.0,
                          best_acc1=best_acc1, wait=True)
                pmgr.close()
                if jax.process_index() == 0:
                    # Pins steps_per_epoch so a mid-epoch resume with a
                    # different batch size/dataset is refused, not
                    # silently mis-mapped. Write-to-temp + rename: a hard
                    # kill mid-dump must not leave a torn meta.json next
                    # to a valid checkpoint.
                    meta_path = os.path.join(pdir, "meta.json")
                    with open(meta_path + ".tmp", "w") as f:
                        json.dump({"steps_per_epoch": spe,
                                   "global_batch": args.batch_size}, f)
                    os.replace(meta_path + ".tmp", meta_path)
                    print(f"=> preempted at global step "
                          f"{trainer.next_global_step}; checkpoint saved "
                          f"to {pdir}. Continue with: "
                          f"--resume {args.output_dir}",
                          flush=True)
            break
        acc1, acc5, _ = trainer.validate(state, val_loader)
        ema_note = ""
        if args.model_ema:
            # The TF recipe evaluates (and tracks best by) the weight
            # moving average; the raw-weight score stays printed alongside.
            from mnasnet_tpu.train.optim import get_ema_params

            raw_acc1 = acc1
            acc1, acc5, _ = trainer.validate(
                state, val_loader, verbose=False,
                params_override=get_ema_params(state.opt_state),
            )
            ema_note = f" (ema; raw={raw_acc1:.3f})"
        is_best = acc1 > best_acc1
        best_acc1 = max(acc1, best_acc1)
        mgr.save(epoch, state, acc1, best_acc1, is_best=is_best)
        if jax.process_index() == 0:
            print(
                f"epoch {epoch}: acc1={acc1:.3f}{ema_note} acc5={acc5:.3f} "
                f"best={best_acc1:.3f}{' *' if is_best else ''} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        # Exact decoder-degradation visibility: the per-occurrence warn
        # samples 1/100/10k, so print the real counters per epoch (the
        # dress-rehearsal 'CMYK fell back exactly once' check parses this
        # line; an ops run greps it). Printed by EVERY process — the
        # fallback counter is per-host (each host decodes only its own
        # shard), so a rank-0-only print would hide a degradation whose
        # files live in another host's shard (tools/multihost_data.py
        # sums the per-rank lines).
        fb = train_loader.fallback_count + val_loader.fallback_count
        if fb:
            print(
                f"[rank {jax.process_index()}] decoder-fallbacks: {fb} "
                f"(train {train_loader.fallback_count}, "
                f"val {val_loader.fallback_count})",
                flush=True,
            )
    if args.bn_recalibrate and not trainer.stopped_early:
        # Exact running-stat refresh with frozen weights (train/bn_recal.py)
        # — then re-validate and persist as the post-training checkpoint
        # (epoch index = args.epochs, one past the last training epoch, so
        # both the raw final and the recalibrated final are kept).
        #
        # Stats are paired with the params actually scored (ADVICE r4; the
        # reference pattern, torch.optim.swa_utils.update_bn, refreshes the
        # stats of the model it evaluates): with --model-ema the headline
        # score, best-tracking, and deployment all use the EMA shadow, so
        # the recal forwards run UNDER the EMA weights — raw-weight stats
        # would mis-normalize the EMA model exactly when the flag matters
        # (short runs/fine-tunes, where raw and EMA diverge most). The
        # saved checkpoint therefore carries batch_stats paired with the
        # EMA shadow in its opt_state (the model a user deploys); without
        # --model-ema they pair with state.params as before.
        from mnasnet_tpu.train.bn_recal import recalibrate_bn

        recal_params = state.params
        ema_note = ""
        if args.model_ema:
            from mnasnet_tpu.train.optim import get_ema_params

            recal_params = get_ema_params(state.opt_state)
            ema_note = " (ema weights, ema-paired stats)"
        state = state.replace(batch_stats=recalibrate_bn(
            model, recal_params, state.batch_stats, train_loader,
            mesh=trainer.mesh, num_batches=args.bn_recalibrate,
            compute_dtype=trainer.compute_dtype,
            verbose=jax.process_index() == 0,
        ))
        acc1, acc5, _ = trainer.validate(
            state, val_loader,
            params_override=recal_params if args.model_ema else None,
        )
        is_best = acc1 > best_acc1
        best_acc1 = max(acc1, best_acc1)
        mgr.save(args.epochs, state, acc1, best_acc1, is_best=is_best)
        if jax.process_index() == 0:
            print(f"bn-recalibrated: acc1={acc1:.3f}{ema_note} "
                  f"acc5={acc5:.3f} "
                  f"best={best_acc1:.3f}{' *' if is_best else ''}",
                  flush=True)
    # Shared shutdown for BOTH the normal end and the preemption break:
    # an in-flight async step checkpoint must finish (not be killed
    # mid-write), and buffered TensorBoard/trace tails must flush.
    mgr.wait()
    if step_mgr is not None:
        step_mgr.wait()
        step_mgr.close()
    if step_tracer is not None:
        step_tracer.close()
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
