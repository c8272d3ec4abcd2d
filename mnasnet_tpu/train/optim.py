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
        zeros = jax.tree.map(jnp.zeros_like, params)
        return ScaleByRmsTFState(ms=zeros, mom=jax.tree.map(jnp.zeros_like, params))

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


def sgd(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """SGD+momentum with coupled, masked weight decay (torch semantics:
    ``g = g + wd·p`` before the momentum update)."""
    parts = []
    if weight_decay:
        parts.append(
            optax.masked(optax.add_decayed_weights(weight_decay), _wd_mask)
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
        zeros = jax.tree.map(jnp.zeros_like, params)
        return State(
            count=jnp.zeros([], jnp.int32),
            ms=zeros,
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
            optax.masked(optax.add_decayed_weights(weight_decay), _wd_mask), inner
        )
    return inner


def create_optimizer(
    name: str,
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    rmsprop_decay: float = 0.9,
    rmsprop_eps: float = 1e-3,
) -> optax.GradientTransformation:
    if name == "sgd":
        return sgd(learning_rate, momentum=momentum, weight_decay=weight_decay)
    if name == "rmsprop":
        return rmsprop_tf(
            learning_rate,
            decay=rmsprop_decay,
            momentum=momentum,
            eps=rmsprop_eps,
            weight_decay=weight_decay,
        )
    raise ValueError(f"unknown optimizer {name!r} (choices: sgd, rmsprop)")
