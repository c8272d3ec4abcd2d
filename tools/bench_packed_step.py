#!/usr/bin/env python
"""Throwaway A/B: fully-packed-state train step vs baseline (validates the
small-leaf interface-packing hypothesis before wiring it into Trainer)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--iters-lo", type=int, default=4)
    ap.add_argument("--iters-hi", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.models.layers import BN_MOMENTUM
    from mnasnet_tpu.train.loss import cross_entropy, topk_correct
    from mnasnet_tpu.train.optim import rmsprop_tf
    from tools.packing_experiment import SmallLeafPacker, packed_wd_mask

    bs, img = args.batch_size, args.image_size
    images = jax.random.normal(jax.random.PRNGKey(0), (bs, img, img, 3), jnp.bfloat16)
    labels = jnp.zeros((bs,), jnp.int32)

    model = create_model("mnasnet1_0", dtype=jnp.bfloat16, bn_ema="external")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False,
    )
    p_packer = SmallLeafPacker(variables["params"])
    s_packer = SmallLeafPacker(variables["batch_stats"])
    print(f"params: {p_packer.n_small} packed 1-D leaves "
          f"({p_packer.vec_size} elems) + {p_packer.n_rest} rest; "
          f"stats: {s_packer.n_small} packed")

    tx = rmsprop_tf(0.01, mask=packed_wd_mask(p_packer))
    pparams0 = p_packer.pack(variables["params"])
    pstats0 = s_packer.pack(variables["batch_stats"])
    opt0 = tx.init(pparams0)
    rng = jax.random.PRNGKey(0)

    def packed_step(carry, x):
        pparams, pstats, opt, step = carry
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(pparams):
            params = p_packer.unpack(pparams)
            logits, mutated = model.apply(
                {"params": params,
                 "batch_stats": s_packer.unpack(pstats)},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            loss = cross_entropy(logits, labels, 0.1)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(pparams)
        new_pstats = {
            "vec": BN_MOMENTUM * pstats["vec"]
            + (1.0 - BN_MOMENTUM) * s_packer.pack(new_stats)["vec"],
            "rest": [],
        }
        updates, new_opt = tx.update(grads, opt, pparams)
        new_pparams = optax.apply_updates(pparams, updates)
        return (new_pparams, new_pstats, new_opt, step + 1), loss

    def make_chain(iters):
        @jax.jit
        def f(carry, x):
            def body(_, st):
                carry, x, acc = st
                carry, loss = packed_step(carry, x)
                return (carry, -x, acc + loss)
            return lax.fori_loop(
                0, iters, body, (carry, x, jnp.zeros((), jnp.float32))
            )[2]
        carry0 = (pparams0, pstats0, opt0, jnp.zeros((), jnp.int32))
        return lambda: f(carry0, images)

    f_lo, f_hi = make_chain(args.iters_lo), make_chain(args.iters_hi)
    jax.block_until_ready(f_lo()); jax.block_until_ready(f_hi())
    best = None
    for _ in range(args.repeats):
        t0 = time.perf_counter(); jax.block_until_ready(f_lo())
        tlo = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(f_hi())
        thi = time.perf_counter() - t0
        s = (thi - tlo) / (args.iters_hi - args.iters_lo)
        best = s if best is None else min(best, s)
        print(f"  slope {s*1e3:.3f} ms/step -> {bs/s:,.0f} img/s", flush=True)
    print(f"PACKED bs={bs}: {best*1e3:.3f} ms/step  {bs/best:,.0f} img/s")


if __name__ == "__main__":
    main()
