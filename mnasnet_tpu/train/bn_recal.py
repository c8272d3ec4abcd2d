"""Exact BatchNorm running-stat recalibration ("BN recal" / SWA update_bn).

Production MnasNet trains with BN EMA decay 0.9997 (torch ``momentum=3e-4``,
SURVEY.md §2.1), so the running stats carry ``0.9997**n`` of their (0, 1)
init after n steps: eval mode is at chance for the first ~10k steps *by
construction*, and after any short run, fine-tune, or topology-elastic
restore with fresh stats it lags the weights by the ~3.3k-step EMA horizon
(measured end to end: CONVERGENCE_r04_prod*.json — 4,096 steps leave 29%
init retention and an at-chance eval column while train mode sits at 100%).
The reference ecosystem's standard answer is a stats-refresh pass over the
training data with frozen weights (``torch.optim.swa_utils.update_bn``);
this module is the TPU-native equivalent: ONE jitted stats-collection
program per batch (GSPMD-sharded over the mesh — the refresh is sync-BN by
construction), exact pooled moments on device, zero weight updates.

Math. For batches b = 1..N with per-batch channel mean ``m_b`` and
(Bessel-corrected) variance ``v_b`` over n elements per channel::

    mu         = sum(m_b) / N
    pooled var = sum(v_b) / N  +  (sum(m_b^2) / N - mu^2)

— the mean within-batch variance plus the between-batch mean spread that a
per-batch EMA structurally drops (the same decomposition the grad-accum
stats combine documents in train/steps.py). The within term keeps each
batch's n/(n-1) Bessel correction instead of re-correcting over N*n
elements — an O(1/n) ≤ 2e-4 relative mismatch at production batch sizes,
orders below BN ε and the ±0.2% top-1 budget.

Feed this a ``drop_last`` loader (train.py wires its train loader): a padded
tail batch would fold its wrap-padding duplicates into the statistics —
there is no validity mask inside BN, exactly as in the reference's
update_bn. :func:`recalibrate_bn` rejects non-drop_last loaders loudly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mnasnet_tpu.data.pipeline import prefetch_to_device
from mnasnet_tpu.parallel.mesh import (
    batch_sharding,
    label_sharding,
    make_mesh,
    replicated,
)


def _combine(sum_s, sum_sq, n):
    """Pooled (mean, var) tree from the elementwise sum / sum-of-squares
    trees of the per-batch raw stats. Recurses the flax ``batch_stats``
    collection; each BN module contributes a ``{'mean', 'var'}`` leaf pair."""
    if isinstance(sum_s, dict):
        if (
            set(sum_s) >= {"mean", "var"}
            and not isinstance(sum_s["mean"], dict)
        ):
            mu = sum_s["mean"] / n
            between = jnp.maximum(sum_sq["mean"] / n - mu * mu, 0.0)
            return {"mean": mu, "var": sum_s["var"] / n + between}
        return {k: _combine(sum_s[k], sum_sq[k], n) for k in sum_s}
    raise TypeError(f"unexpected batch_stats leaf container: {type(sum_s)}")


def make_recal_step(model):
    """Returns ``step(params, sum_s, sum_sq, images) -> (sum_s', sum_sq')``.

    One training-mode forward that extracts each BN layer's RAW batch
    statistics and accumulates them. With ``bn_ema='external'`` the module
    already writes raw (mean, Bessel var); with the torch-faithful
    ``bn_ema='module'`` it writes ``momentum*old + (1-momentum)*raw``, so
    feeding zeroed old stats and dividing by ``1-momentum`` recovers the raw
    values exactly (no catastrophic cancellation — nothing is subtracted).
    Dropout sits above every BN layer, so a constant fold-in key is fine and
    keeps the program deterministic.
    """
    module_ema = getattr(model, "bn_ema", "module") == "module"
    inv = 1.0 / (1.0 - float(getattr(model, "bn_momentum", 0.9997)))

    def step(params, sum_s, sum_sq, images):
        zeros = jax.tree.map(jnp.zeros_like, sum_s)
        _, upd = model.apply(
            {"params": params, "batch_stats": zeros},
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        raw = upd["batch_stats"]
        if module_ema:
            raw = jax.tree.map(lambda a: a * inv, raw)
        sum_s = jax.tree.map(jnp.add, sum_s, raw)
        sum_sq = jax.tree.map(lambda acc, r: acc + r * r, sum_sq, raw)
        return sum_s, sum_sq

    return step


def recalibrate_bn(
    model,
    params,
    batch_stats,
    loader,
    *,
    mesh=None,
    num_batches: Optional[int] = None,
    compute_dtype=jnp.float32,
    verbose: bool = True,
):
    """Replace ``batch_stats`` with exact pooled statistics over ``loader``.

    Weights are untouched; returns the new batch_stats tree. ``num_batches``
    caps the pass (None = one full epoch). The per-batch forward is the
    model's training-mode graph (same one_pass/two_pass BN formulation), jit
    over the mesh with the batch axis sharded — multi-host/multi-chip runs
    recalibrate with GLOBAL statistics for free.
    """
    # Loud guard for the docstring contract (ADVICE r4): a non-drop_last
    # loader wrap-pads its tail batch and the padding would fold silently
    # into the pooled moments — labels (the -1 sentinel) are discarded here,
    # so nothing downstream would catch it.
    if not getattr(loader, "drop_last", True):
        raise ValueError(
            "recalibrate_bn needs a drop_last loader: a wrap-padded tail "
            "batch would fold padding into the pooled statistics (there is "
            "no validity mask inside BN). Rebuild the loader with "
            "drop_last=True, as train.py's train loader does."
        )
    mesh = mesh if mesh is not None else make_mesh()
    repl = replicated(mesh)
    step = jax.jit(
        make_recal_step(model),
        in_shardings=(repl, repl, repl, batch_sharding(mesh)),
        out_shardings=(repl, repl),
        donate_argnums=(1, 2),
    )
    sum_s = jax.tree.map(lambda a: jnp.zeros_like(a), batch_stats)
    sum_sq = jax.tree.map(lambda a: jnp.zeros_like(a), batch_stats)
    shardings = (batch_sharding(mesh), label_sharding(mesh))
    it = prefetch_to_device(
        loader.epoch(0), sharding=shardings, dtype=compute_dtype
    )
    n = 0
    for images, _labels in it:
        step_out = step(params, sum_s, sum_sq, images)
        sum_s, sum_sq = step_out
        n += 1
        if num_batches is not None and n >= num_batches:
            break
    if n == 0:
        raise ValueError("recalibrate_bn: loader yielded no batches")
    new_stats = jax.jit(_combine, static_argnums=(2,))(sum_s, sum_sq, n)
    jax.block_until_ready(new_stats)
    if verbose:
        print(f"[bn-recal] running stats recomputed over {n} batches "
              f"(exact pooled moments, weights untouched)", flush=True)
    return new_stats
