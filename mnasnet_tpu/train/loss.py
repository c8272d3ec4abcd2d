"""Label-smoothed cross-entropy + top-k accuracy (SURVEY.md §2.2).

Loss matches ``nn.CrossEntropyLoss(label_smoothing=ε)``: smoothed target
distribution ``(1−ε)·onehot + ε/K`` against log-softmax, mean over batch.
Labels < 0 are padding sentinels (static-shape tail batches) and are masked
out of both loss and accuracy — eval metrics stay exact without dynamic
shapes. Metrics stay on-device (the reference's ``.item()`` sync-point hazard
— SURVEY.md §3.5 — is avoided; hosts fetch asynchronously).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Mean label-smoothed softmax CE over valid (label ≥ 0) samples.

    logits (B,K) fp32, labels (B,) int (−1 = padding).
    """
    mask = labels >= 0
    safe_labels = jnp.maximum(labels, 0)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(log_probs, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(mask, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)


def topk_correct(logits: jax.Array, labels: jax.Array, ks=(1, 5)) -> dict[str, jax.Array]:
    """Top-k-correct counts per k plus the valid-sample 'count' (summable
    across batches/devices; the reference's ``accuracy(output, target)``)."""
    mask = labels >= 0
    num_classes = logits.shape[-1]
    maxk = min(max(ks), num_classes)  # top-5 on a 4-class head is top-4
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = (pred == labels[:, None]) & mask[:, None]
    out = {
        f"top{k}": jnp.sum(jnp.any(correct[:, :min(k, maxk)], axis=1))
        for k in ks
    }
    out["count"] = jnp.sum(mask).astype(jnp.int32)
    return out
