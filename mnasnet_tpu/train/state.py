"""TrainState: the single donated pytree a jit'd train step consumes/returns.

The reference's per-step loop does forward → backward → optimizer.step() with
a runtime autograd walk and NCCL hooks (SURVEY.md §3.1). Here the whole step —
fwd, bwd (``jax.value_and_grad``), BN stat update, optimizer update, metric
accumulation — is ONE compiled XLA program with the state donated, so params
update in place in HBM and there are no host sync points.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array  # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array  # PRNG key, folded per step for dropout

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation, rng):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            rng=rng,
        )
