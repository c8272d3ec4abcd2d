"""LR schedules of the reference + MnasNet lineage (SURVEY.md §2.2):

  * ``step``: ÷10 every 30 epochs (canonical ImageNet recipe)
  * ``cosine``: cosine decay to 0 over the run
  * ``exp``: ×0.97 every 2.4 epochs (MnasNet-family alternative)

All support linear warmup (large-batch LR scaling, [B:configs[3]]) and are
*per-step* schedules (optax style) parameterised by steps_per_epoch — the
reference recomputed per-epoch LR from the epoch number (SURVEY.md §3.4);
per-step warmup is strictly finer-grained and equivalent at warmup=0.
"""

from __future__ import annotations

import optax


def make_schedule(
    name: str,
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: float = 0.0,
    step_decay_factor: float = 0.1,
    step_decay_epochs: float = 30.0,
    exp_decay_factor: float = 0.97,
    exp_decay_epochs: float = 2.4,
) -> optax.Schedule:
    warmup_steps = int(round(warmup_epochs * steps_per_epoch))
    total_steps = max(epochs * steps_per_epoch, warmup_steps + 1)

    if name == "step":
        main = optax.exponential_decay(
            base_lr,
            transition_steps=int(round(step_decay_epochs * steps_per_epoch)),
            decay_rate=step_decay_factor,
            staircase=True,
        )
    elif name == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, decay_steps=max(total_steps - warmup_steps, 1)
        )
    elif name == "exp":
        main = optax.exponential_decay(
            base_lr,
            transition_steps=int(round(exp_decay_epochs * steps_per_epoch)),
            decay_rate=exp_decay_factor,
            staircase=True,
        )
    elif name == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown schedule {name!r}")

    if warmup_steps == 0:
        return main
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, main], [warmup_steps])


def scale_lr_for_batch(base_lr: float, batch_size: int, base_batch: int = 256) -> float:
    """Linear large-batch LR scaling (Goyal et al. rule, [B:configs[3]])."""
    return base_lr * batch_size / base_batch
