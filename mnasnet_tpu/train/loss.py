"""Label-smoothed cross-entropy + top-k accuracy (SURVEY.md §2.2).

Loss matches ``nn.CrossEntropyLoss(label_smoothing=ε)``: smoothed target
distribution ``(1−ε)·onehot + ε/K`` against log-softmax, mean over batch.
Metrics stay on-device (the reference's ``.item()`` sync-point hazard —
SURVEY.md §3.5 — is avoided; hosts fetch asynchronously).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Mean label-smoothed softmax CE. logits (B,K) fp32, labels (B,) int."""
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(log_probs, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.mean(nll)


def topk_correct(logits: jax.Array, labels: jax.Array, ks=(1, 5)) -> dict[str, jax.Array]:
    """Number of top-k-correct samples per k (summable across batches/devices;
    the reference's ``accuracy(output, target, topk=(1,5))``)."""
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = pred == labels[:, None]
    return {f"top{k}": jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in ks}
