"""jit-compiled train / eval steps.

One XLA program per step (SURVEY.md §3.5 "all intra-step boundaries collapse
into one compiled program"). Data-parallelism is expressed by *sharding the
batch* over the mesh at call sites (``parallel/``); because these functions
are written as global-batch math, GSPMD inserts the gradient all-reduce (and
makes BN stats global = sync-BN) automatically — the TPU-native equivalent of
DDP's NCCL bucket hooks (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from mnasnet_tpu.train.loss import cross_entropy, topk_correct
from mnasnet_tpu.train.state import TrainState

# Measured conv-emitter cliff on this backend: the bs128→bs256 train step
# loses ~14% img/s to a conv tiling regression no compile option recovers
# (SWEEP_XLAFLAGS_BS256_r04.json), while accumulating two bs128 microbatches
# beats the direct bs256 step by 11% (ACCUM_OVERHEAD_r04.json: 8,095 vs
# 7,288 img/s at global 256). Per-chip microbatches therefore default to
# ≤128 via grad accumulation.
MICROBATCH_LIMIT = 128


def auto_grad_accum(per_chip_batch: int, limit: int = MICROBATCH_LIMIT) -> int:
    """Accumulation factor for ``--grad-accum auto`` (train.py).

    Smallest K that (a) divides ``per_chip_batch`` and (b) brings the
    per-chip microbatch to ≤ ``limit`` — sidestepping the measured bs>128
    conv-emitter cliff (module constant above). Returns 1 when the batch
    already fits, or when no divisor exists without over-splitting
    (microbatch < limit/2 — e.g. a prime per-chip batch): an odd batch size
    is an explicit user choice, and K microbatches of ~1 sample would cost
    far more than the cliff.
    """
    if per_chip_batch <= limit:
        return 1
    k0 = -(-per_chip_batch // limit)  # ceil
    for k in range(k0, 2 * k0 + 1):
        if per_chip_batch % k == 0:
            return k
    return 1


def fused_ema_stats(old_stats, batch_stats, decay: float):
    """Apply ``new = decay·old + (1−decay)·batch`` over the WHOLE stats tree
    as one flat fusion. With the model in ``bn_ema='external'`` mode the
    mutated batch_stats collection holds raw (Bessel-corrected) batch
    statistics; updating the ~100 tiny per-BN vectors leaf-by-leaf costs a
    swarm of 1-element XLA fusions plus HBM↔VMEM spill copies (profiled
    ~11% of the train step at bs128 — BASELINE.md), so pack → one EMA →
    unpack. Elementwise math is unchanged."""
    leaves_old, treedef = jax.tree.flatten(old_stats)
    leaves_new = jax.tree.leaves(batch_stats)
    v_old = jnp.concatenate([l.ravel() for l in leaves_old])
    v_new = jnp.concatenate([l.ravel() for l in leaves_new])
    v = decay * v_old + (1.0 - decay) * v_new
    out, off = [], 0
    for l in leaves_old:
        out.append(v[off:off + l.size].reshape(l.shape))
        off += l.size
    return jax.tree.unflatten(treedef, out)


def _ema_outside(model) -> float | None:
    """BN EMA decay if the model defers running-stat EMA to the step."""
    if getattr(model, "bn_ema", "module") != "external":
        return None
    from mnasnet_tpu.models.layers import BN_MOMENTUM

    return getattr(model, "bn_momentum", BN_MOMENTUM)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    label_smoothing: float = 0.1,
    diagnostics: bool = False,
    grad_accum: int = 1,
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, dict]]:
    """Returns train_step(state, images NHWC, labels) → (state, metrics).

    Jit with ``donate_argnums=(0,)`` at the call site so the old state's HBM
    is reused. ``diagnostics=True`` adds grad/param norms and max-|logit| to
    the metrics (instability forensics — SURVEY.md §4.5; a few extra
    reductions per step, off in production).

    ``grad_accum=k`` splits the batch into k sequential microbatches inside
    the SAME compiled step (``lax.scan`` — only one microbatch's activations
    are live at a time), takes one optimizer update on the combined
    gradients, and advances ``state.step`` once. Semantics deliberately
    mirror :func:`make_local_bn_train_step` with k replicas — per-microbatch
    BN statistics (combined by mean into the EMA), count-weighted gradient /
    loss combine, per-microbatch dropout folds — so sequential accumulation
    ≡ parallel local-BN data-parallelism (tested in tests/test_train.py).
    This is the single-chip route to [B:configs[3]]-scale effective batches:
    memory scales with the microbatch while the LR-scaling rule sees the
    full batch. Requires ``bn_ema='external'`` on the model (the module-EMA
    path would apply the EMA once per microbatch) and a batch divisible by k.
    """
    ema_decay = _ema_outside(model)
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if grad_accum > 1:
        if ema_decay is None:
            raise ValueError(
                "grad_accum > 1 requires bn_ema='external' on the model: the "
                "step combines per-microbatch BN statistics and applies the "
                "running-stats EMA exactly once per optimizer update"
            )
        return _make_accum_train_step(
            model, tx, label_smoothing, diagnostics, grad_accum, ema_decay
        )

    def train_step(state: TrainState, images: jax.Array, labels: jax.Array):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            loss = cross_entropy(logits, labels, label_smoothing)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if ema_decay is not None:
            new_stats = fused_ema_stats(state.batch_stats, new_stats, ema_decay)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **topk_correct(logits, labels)}
        if diagnostics:
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["update_norm"] = optax.global_norm(updates)
            metrics["param_norm"] = optax.global_norm(new_params)
            metrics["max_abs_logit"] = jnp.max(jnp.abs(logits))
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def _make_accum_train_step(
    model, tx, label_smoothing, diagnostics, grad_accum, ema_decay
):
    """Gradient-accumulation train step (see :func:`make_train_step`)."""

    def train_step(state: TrainState, images: jax.Array, labels: jax.Array):
        if images.shape[0] % grad_accum:
            raise ValueError(
                f"batch size {images.shape[0]} not divisible by "
                f"grad_accum={grad_accum}"
            )
        micro = images.shape[0] // grad_accum
        step_rng = jax.random.fold_in(state.rng, state.step)
        # Microbatch i = rows [i·micro, (i+1)·micro) — the same contiguous
        # chunks the 'data' mesh axis would own, so the local-BN equivalence
        # holds shard-for-shard.
        imgs = images.reshape(grad_accum, micro, *images.shape[1:])
        lbls = labels.reshape(grad_accum, micro)
        # Count-weighted combine needs the global valid count up front
        # (one cheap reduction over labels; exact with padded tails).
        total = jnp.maximum(jnp.sum(lbls >= 0), 1).astype(jnp.float32)

        def loss_fn(params, x, y, rng):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            count = jnp.sum(y >= 0)
            loss = cross_entropy(logits, y, label_smoothing)
            return loss, (logits, mutated["batch_stats"], count)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, xs):
            g_acc, s_acc, loss_acc, m_acc, maxl = carry
            i, x, y = xs
            rng = jax.random.fold_in(step_rng, i)
            (loss, (logits, stats, count)), grads = grad_fn(
                state.params, x, y, rng
            )
            w = count.astype(jnp.float32) / total
            g_acc = jax.tree.map(
                lambda a, g: a + g * w.astype(g.dtype), g_acc, grads
            )
            s_acc = jax.tree.map(
                lambda a, s: a + s / grad_accum, s_acc, stats
            )
            loss_acc = loss_acc + loss * w
            m_acc = jax.tree.map(
                lambda a, v: a + v, m_acc, topk_correct(logits, y)
            )
            maxl = jnp.maximum(maxl, jnp.max(jnp.abs(logits)))
            return (g_acc, s_acc, loss_acc, m_acc, maxl), None

        zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)  # noqa: E731
        m0 = {
            "top1": jnp.zeros((), jnp.int32),
            "top5": jnp.zeros((), jnp.int32),
            "count": jnp.zeros((), jnp.int32),
        }
        carry0 = (
            zeros_like(state.params),
            zeros_like(state.batch_stats),
            jnp.zeros((), jnp.float32),
            m0,
            jnp.zeros((), jnp.float32),
        )
        (grads, new_stats, loss, counts, maxl), _ = jax.lax.scan(
            body, carry0, (jnp.arange(grad_accum), imgs, lbls)
        )
        new_stats = fused_ema_stats(state.batch_stats, new_stats, ema_decay)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **counts}
        if diagnostics:
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["update_norm"] = optax.global_norm(updates)
            metrics["param_norm"] = optax.global_norm(new_params)
            metrics["max_abs_logit"] = maxl
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def make_local_bn_train_step(
    model,
    tx: optax.GradientTransformation,
    label_smoothing: float = 0.1,
    *,
    mesh,
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, dict]]:
    """Train step with **per-device BN batch statistics** (``--no-sync-bn``).

    This is the reference's actual DDP behavior (SURVEY.md §2.5): each
    replica normalizes with the statistics of its own batch shard; only
    gradients cross devices. Implemented with ``shard_map`` over the 'data'
    axis — inside the mapped function every array is the local shard, so the
    model's BN sees only local samples. Gradients/loss/metrics are combined
    with explicit ``psum``; the running-stats EMA is updated with the
    cross-replica *mean* of the local batch stats so the state stays
    replicated (strictly better than the reference, which checkpoints
    rank-0's local stats).
    """
    if mesh.shape.get("spatial", 1) != 1:
        raise ValueError("local-BN path requires spatial mesh axis of size 1")
    if mesh.shape.get("dcn", 1) != 1:
        raise ValueError(
            "local-BN path shards only over 'data'; use sync-BN (GSPMD) "
            "for multi-slice ('dcn') meshes"
        )
    ema_decay = _ema_outside(model)

    def per_shard(params, batch_stats, images, labels, step_rng):
        # Distinct dropout masks per replica, like DDP's per-process RNG.
        rng = jax.random.fold_in(step_rng, jax.lax.axis_index("data"))

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            count = jnp.sum(labels >= 0)
            loss = cross_entropy(logits, labels, label_smoothing)
            return loss, (logits, mutated["batch_stats"], count)

        (loss, (logits, new_stats, count)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # Valid-count-weighted combine: exact global mean even if a tail
        # shard carries padding (train uses drop_last, so usually equal).
        total = jnp.maximum(jax.lax.psum(count, "data"), 1)
        weight = count.astype(jnp.float32) / total.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g * weight.astype(g.dtype), "data"), grads
        )
        loss = jax.lax.psum(loss * weight, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        metrics = jax.tree.map(
            lambda x: jax.lax.psum(x, "data"), topk_correct(logits, labels)
        )
        return grads, new_stats, loss, metrics

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    def train_step(state: TrainState, images: jax.Array, labels: jax.Array):
        step_rng = jax.random.fold_in(state.rng, state.step)
        grads, new_stats, loss, counts = sharded(
            state.params, state.batch_stats, images, labels, step_rng
        )
        if ema_decay is not None:
            # new_stats is the cross-replica mean of raw local batch stats;
            # EMA is linear, so EMA(pmean) ≡ pmean(per-replica EMA).
            new_stats = fused_ema_stats(state.batch_stats, new_stats, ema_decay)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **counts}
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, label_smoothing: float = 0.0):
    """eval_step(variables, images, labels) → metrics (running-stats BN,
    no dropout — the reference's ``validate()``, SURVEY.md §3.2)."""

    def eval_step(params, batch_stats, images, labels):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        return {
            "loss": cross_entropy(logits, labels, label_smoothing),
            **topk_correct(logits, labels),
        }

    return eval_step


def make_predict_fn(model):
    """Pure inference: images → logits (the [B:configs[0]] single-image path
    and the bench inference path)."""

    def predict(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )

    return predict
