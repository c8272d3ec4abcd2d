"""Optimizers for the MNASNet recipe: SGD+momentum and TF-semantics RMSProp.

The reference offers SGD(momentum=0.9) and RMSProp [B:north_star]. The
canonical MnasNet recipe (SURVEY.md §2.2) is TF-style RMSProp: decay 0.9,
momentum 0.9, eps 1e-3 *inside* the sqrt. torch's RMSprop (and optax's
``scale_by_rms``) put eps *outside* — a known silent top-1 trap (SURVEY.md §7
hard-part 3) — so ``rmsprop_tf`` implements the TF update exactly:

    ms  = decay·ms + (1−decay)·g²
    mom = momentum·mom + lr · g / sqrt(ms + eps)
    p  -= mom

Weight decay is coupled (added to the gradient, torch semantics) and masked
off BatchNorm scales/biases and the classifier bias, matching the recipe's
"wd excluded from BN/bias".
"""

from __future__ import annotations

from typing import Any, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, optax.Schedule]


class ScaleByRmsTFState(NamedTuple):
    ms: Any  # second-moment EMA
    mom: Any  # momentum buffer


def scale_by_rms_tf(
    decay: float = 0.9, momentum: float = 0.9, eps: float = 1e-3
) -> optax.GradientTransformation:
    """TF1-style RMSProp scaling with integrated momentum (eps inside sqrt).

    Emits the *update direction* (to be multiplied by the LR downstream is
    WRONG for TF semantics — the momentum buffer accumulates lr·g/rms — so
    this transform takes the learning rate via ``optax.inject_hyperparams``
    style composition in :func:`rmsprop_tf` instead).
    """

    def init_fn(params):
        # ms starts at ONES like TF1's RMSPropOptimizer mean_square slot
        # (optax scale_by_rms(initial_scale=1.) equivalent). Starting at 0
        # (torch's choice) makes the first updates ≈ lr·g/√((1-decay)·g²)
        # = 3.16·lr·sign(g) — a coherent full-magnitude kick on every
        # parameter that blew epoch-0 losses to 1e6 in the round-2
        # convergence runs (BASELINE.md round 3).
        return ScaleByRmsTFState(
            ms=jax.tree.map(jnp.ones_like, params),
            mom=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        ms = jax.tree.map(
            lambda m, g: decay * m + (1.0 - decay) * jnp.square(g), state.ms, updates
        )
        mom = jax.tree.map(
            lambda b, m, g: momentum * b + g * jax.lax.rsqrt(m + eps),
            state.mom,
            ms,
            updates,
        )
        return mom, ScaleByRmsTFState(ms=ms, mom=mom)

    return optax.GradientTransformation(init_fn, update_fn)


def _wd_mask(params) -> Any:
    """True where weight decay applies: conv/dense kernels only — BN
    scale/bias and dense bias are excluded (SURVEY.md §2.2 optimizer row)."""

    def mask(path, leaf):
        del leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name in ("kernel",) or name.endswith("dw_kernel")

    return jax.tree_util.tree_map_with_path(mask, params)


# --------------------------------------------------------------------------
# Fused flat updates (TPU small-tensor optimization).
#
# The model has ~160 parameter leaves, over 100 of which are tiny per-channel
# BN vectors (16..1280 floats). Updating each leaf as its own XLA op makes the
# step tail a swarm of 1-element-iteration fusions plus HBM↔VMEM spill copies
# of 128-byte arrays — measured 1.7 ms/step (11%) at bs128 on v5e
# (tools/profile_step.py, BASELINE.md). Packing all leaves into two flat fp32
# vectors — one for weight-decayed kernels, one for the BN/bias group — turns
# the whole optimizer update into a handful of large elementwise fusions. The
# per-element math is IDENTICAL (elementwise ops commute with concatenation),
# so this is bitwise-equivalent per parameter, not an approximation.
# --------------------------------------------------------------------------


def _flat_groups(tree, small_only: bool):
    """Leaf partition: group key per leaf, or None to leave it unpacked.

    ``small_only`` packs just the 1-D per-channel leaves (BN scale/bias,
    dense bias — all wd-excluded), leaving conv kernels on the normal
    per-leaf path; otherwise every leaf is packed into its wd group.
    """
    leaves, treedef = jax.tree.flatten(tree)
    marks = jax.tree.leaves(_wd_mask(tree))
    keys = []
    for leaf, m in zip(leaves, marks):
        if small_only and (leaf.ndim != 1):
            keys.append(None)
        else:
            keys.append("decay" if m else "no_decay")
    return leaves, treedef, keys


def pack_flat(tree, small_only: bool = False) -> dict:
    """Pack a params-shaped pytree into {'decay': vec, 'no_decay': vec,
    'rest': [unpacked leaves...]}."""
    leaves, _, keys = _flat_groups(tree, small_only)
    groups = {"decay": [], "no_decay": []}
    rest = []
    for leaf, key in zip(leaves, keys):
        if key is None:
            rest.append(leaf)
        else:
            groups[key].append(leaf.ravel())
    # Empty groups are OMITTED (not zero-size arrays): orbax refuses to
    # checkpoint zero-size leaves, and the structure stays deterministic
    # for a given params template.
    out = {"rest": rest}
    for key, parts in groups.items():
        if parts:
            out[key] = jnp.concatenate(parts)
    return out


def unpack_flat(packed: dict, template, small_only: bool = False):
    """Inverse of :func:`pack_flat` (shapes/partition from ``template``)."""
    leaves, treedef, keys = _flat_groups(template, small_only)
    out, offs, ri = [], {"decay": 0, "no_decay": 0}, 0
    for leaf, key in zip(leaves, keys):
        if key is None:
            out.append(packed["rest"][ri])
            ri += 1
        else:
            off = offs[key]
            out.append(packed[key][off:off + leaf.size].reshape(leaf.shape))
            offs[key] = off + leaf.size
    return jax.tree.unflatten(treedef, out)


def _flat_mask(template, small_only: bool):
    _, _, keys = _flat_groups(template, small_only)
    marks = jax.tree.leaves(_wd_mask(template))
    mask = {"rest": [m for m, k in zip(marks, keys) if k is None]}
    if any(k == "decay" for k in keys):
        mask["decay"] = True
    if any(k == "no_decay" for k in keys):
        mask["no_decay"] = False
    return mask


def fused_flat(make_inner, small_only: bool = False) -> optax.GradientTransformation:
    """Wrap ``make_inner(mask) -> GradientTransformation`` to run on packed
    flat vectors. The returned transformation still consumes/produces the
    original pytree structure; only the internal math (and the optimizer
    state, which becomes vectors per packed group) is flattened."""
    inner_cache = {}

    def get_inner(template):
        # Keyed on the template's structure + leaf shapes: reusing one
        # fused_flat transformation across models with different param
        # structures must rebuild the inner transform (a stale wd mask /
        # packed-state layout would silently corrupt the update).
        leaves, treedef = jax.tree.flatten(template)
        key = (treedef, tuple(jnp.shape(l) for l in leaves))
        if key not in inner_cache:
            inner_cache[key] = make_inner(_flat_mask(template, small_only))
        return inner_cache[key]

    def init_fn(params):
        return get_inner(params).init(pack_flat(params, small_only))

    def update_fn(updates, state, params=None):
        inner = get_inner(updates)
        packed_updates = pack_flat(updates, small_only)
        packed_params = pack_flat(params, small_only) if params is not None else None
        out, new_state = inner.update(packed_updates, state, packed_params)
        return unpack_flat(out, updates, small_only), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def backbone_frozen_mask(params) -> Any:
    """Frozen-mask for linear-probe fine-tuning (True = frozen): every
    parameter except the top-level ``classifier`` head. The torch-lineage
    transfer-learning recipe (``requires_grad=False`` on the backbone after
    swapping the final Linear) — see :func:`freeze`."""
    return {
        k: jax.tree.map(lambda _: k != "classifier", v)
        for k, v in params.items()
    }


def freeze(
    tx: optax.GradientTransformation, frozen_mask
) -> optax.GradientTransformation:
    """Zero the FINAL updates of frozen parameters (torch
    ``requires_grad=False`` analogue). Chained after ``tx`` — not before —
    because the coupled weight decay inside ``tx`` adds ``wd·p`` to the
    (zeroed) gradient, which would silently decay "frozen" weights if the
    mask were applied at the gradient instead of the update.

    Matching torch semantics exactly: BatchNorm *running statistics* are
    not parameters and keep updating in training mode (callers wanting
    fully static backbone behavior should evaluate with running stats,
    which eval mode already does). Optimizer slots for frozen params still
    exist (a small memory cost) but are never applied.
    """
    return optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))


class ModelEmaState(NamedTuple):
    count: jnp.ndarray
    ema_params: Any
    inner: Any


def with_model_ema(
    tx: optax.GradientTransformation, decay: float = 0.9999,
    warmup: bool = True,
) -> optax.GradientTransformation:
    """Maintain an exponential moving average of the **post-update model
    parameters** inside the optimizer state (the TF MnasNet recipe's
    ``moving_average_decay=0.9999`` — evaluation uses the averaged weights;
    tensorflow/tpu's mnasnet trainer applies ``tf.train.
    ExponentialMovingAverage(decay, num_updates=global_step)``).

    TF semantics, exactly: shadow initialized to the initial parameter
    values; per update ``shadow -= (1 − d)·(shadow − param)`` with
    ``d = min(decay, (1+n)/(10+n))`` when ``warmup`` (the ``num_updates``
    ramp — without it a 0.9999-decay average is useless for the first
    ~10k steps).

    The wrapper is OUTERMOST (see :func:`create_optimizer`), so
    ``opt_state`` is a :class:`ModelEmaState` and the shadow tree rides the
    normal checkpoint payload; :func:`get_ema_params` reads it back from a
    live state or a template-free orbax restore. BN running statistics are
    NOT double-averaged: they already carry their own 0.9997 EMA
    (models/layers.py), and eval-with-EMA pairs the averaged params with
    the regular ``batch_stats``.
    """

    def init_fn(params):
        return ModelEmaState(
            count=jnp.zeros([], jnp.int32),
            # Fresh buffers, not aliases: the shadow and the live params
            # both sit in the donated TrainState, and donating one buffer
            # through two leaves is an XLA Execute() error.
            ema_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
            inner=tx.init(params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("with_model_ema requires params in update()")
        new_updates, inner_state = tx.update(updates, state.inner, params)
        new_params = optax.apply_updates(params, new_updates)
        count = state.count + 1
        d = jnp.asarray(decay, jnp.float32)
        if warmup:
            n = count.astype(jnp.float32)
            d = jnp.minimum(d, (1.0 + n) / (10.0 + n))
        ema = jax.tree.map(
            lambda e, p: e - (1.0 - d).astype(e.dtype) * (e - p),
            state.ema_params, new_params,
        )
        return new_updates, ModelEmaState(
            count=count, ema_params=ema, inner=inner_state
        )

    return optax.GradientTransformation(init_fn, update_fn)


def get_ema_params(opt_state):
    """The EMA shadow params from a live opt_state, or from the raw
    (template-free orbax-restored, namedtuples-as-dicts) form; None when no
    model EMA is active. Searches nested wrapper states so callers don't
    depend on transformation order."""
    seen = []

    def walk(node):
        if isinstance(node, ModelEmaState):
            seen.append(node.ema_params)
            return
        if isinstance(node, dict):
            if "ema_params" in node:
                seen.append(node["ema_params"])
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(opt_state)
    return seen[0] if seen else None


def sgd(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    nesterov: bool = False,
    mask=_wd_mask,
) -> optax.GradientTransformation:
    """SGD+momentum with coupled, masked weight decay (torch semantics:
    ``g = g + wd·p`` before the momentum update)."""
    parts = []
    if weight_decay:
        parts.append(
            optax.masked(optax.add_decayed_weights(weight_decay), mask)
        )
    parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def rmsprop_tf(
    learning_rate: ScalarOrSchedule,
    decay: float = 0.9,
    momentum: float = 0.9,
    eps: float = 1e-3,
    weight_decay: float = 1e-5,
    mask=_wd_mask,
) -> optax.GradientTransformation:
    """TF-semantics RMSProp of the MnasNet paper recipe.

    The momentum buffer accumulates ``lr·g/sqrt(ms+eps)`` (lr inside the
    buffer, TF behavior) — implemented by scaling updates by lr *before* the
    momentum accumulation.
    """

    class State(NamedTuple):
        count: jnp.ndarray
        ms: Any
        mom: Any

    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init_fn(params):
        # ms=1 at init — TF1 RMSPropOptimizer semantics (see scale_by_rms_tf)
        return State(
            count=jnp.zeros([], jnp.int32),
            ms=jax.tree.map(jnp.ones_like, params),
            mom=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        lr = sched(state.count)
        ms = jax.tree.map(
            lambda m, g: decay * m + (1.0 - decay) * jnp.square(g), state.ms, updates
        )
        mom = jax.tree.map(
            lambda b, m, g: momentum * b + lr * g * jax.lax.rsqrt(m + eps),
            state.mom,
            ms,
            updates,
        )
        new_updates = jax.tree.map(lambda m: -m, mom)
        return new_updates, State(count=state.count + 1, ms=ms, mom=mom)

    inner = optax.GradientTransformation(init_fn, update_fn)
    if weight_decay:
        return optax.chain(
            optax.masked(optax.add_decayed_weights(weight_decay), mask), inner
        )
    return inner


def create_optimizer(
    name: str,
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    rmsprop_decay: float = 0.9,
    rmsprop_eps: float = 1e-3,
    fused: bool | str = False,
    model_ema: float | None = None,
    model_ema_warmup: bool = True,
    frozen_mask=None,
) -> optax.GradientTransformation:
    """``fused=True`` runs the (elementwise-identical) update math on packed
    flat vectors instead of ~160 leaves; ``fused='small'`` packs only the
    1-D per-channel leaves — see :func:`fused_flat`. ``model_ema=0.9999``
    additionally maintains the TF-recipe weight moving average (outermost,
    over the real unpacked tree — see :func:`with_model_ema`).
    ``frozen_mask`` (pytree or callable, True = frozen) zeroes the final
    updates of the marked params — see :func:`freeze`; composes with both
    ``fused`` (the core tx unpacks before the mask applies) and
    ``model_ema`` (the shadow tracks the post-freeze params)."""
    if name == "sgd":
        make = lambda mask: sgd(
            learning_rate, momentum=momentum, weight_decay=weight_decay,
            mask=mask,
        )
    elif name == "rmsprop":
        make = lambda mask: rmsprop_tf(
            learning_rate,
            decay=rmsprop_decay,
            momentum=momentum,
            eps=rmsprop_eps,
            weight_decay=weight_decay,
            mask=mask,
        )
    else:
        raise ValueError(f"unknown optimizer {name!r} (choices: sgd, rmsprop)")
    tx = (
        fused_flat(make, small_only=(fused == "small"))
        if fused
        else make(_wd_mask)
    )
    if frozen_mask is not None:
        tx = freeze(tx, frozen_mask)
    if model_ema:
        if not (0.0 < model_ema < 1.0):
            raise ValueError(f"model_ema decay must be in (0, 1), got {model_ema}")
        tx = with_model_ema(tx, model_ema, warmup=model_ema_warmup)
    return tx
