"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DataParallel/DDP+NCCL layer (SURVEY.md §2.5, §2.6).

Strategy (matches the reference's capability envelope — DP is its only
parallelism): a 1-D ``('data',)`` mesh; batch sharded over 'data'; params,
batch_stats and opt_state replicated. GSPMD compiles the gradient all-reduce
(and global BN stats) into the step over ICI; there is no user-space
communication code, no rendezvous, no bucketing — XLA's latency-hiding
scheduler overlaps the collectives with the backward pass.

A second mesh axis ``'spatial'`` is exposed for the out-of-contract stretch of
spatially partitioning very large inputs (the CNN analogue of sequence
parallelism — SURVEY.md §5.7); the default grid keeps it at size 1.

A leading ``'dcn'`` axis (multi-slice stretch, [B:configs[3]]) is available
via ``make_mesh(dcn=N)``: the batch shards over ``('dcn','data')`` jointly,
so GSPMD emits a hierarchical gradient reduction — intra-slice partials over
ICI, the cross-slice combine over DCN when the device grid actually spans
slices. No step-code changes: sharding annotations are the whole mechanism.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    spatial: int = 1,
    dcn: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // (spatial * dcn)
    if dcn * data * spatial != len(devices):
        raise ValueError(
            f"mesh {dcn}x{data}x{spatial} != {len(devices)} devices"
        )
    if dcn > 1:
        arr = np.asarray(devices).reshape(dcn, data, spatial)
        return Mesh(arr, axis_names=("dcn", "data", "spatial"))
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def _batch_axes(mesh: Mesh):
    """The mesh axes the batch (N) dimension shards over."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else "data"


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over 'data' (and 'dcn' when present), H over 'spatial'
    (size-1 ⇒ no-op)."""
    return NamedSharding(mesh, P(_batch_axes(mesh), "spatial", None, None))


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, images: Any, labels: Any):
    """Place a host-global batch onto the mesh (per-host slices in multi-host
    setups arrive via ``jax.make_array_from_process_local_data``)."""
    if jax.process_count() > 1:
        images = jax.make_array_from_process_local_data(batch_sharding(mesh), images)
        labels = jax.make_array_from_process_local_data(label_sharding(mesh), labels)
        return images, labels
    return (
        jax.device_put(images, batch_sharding(mesh)),
        jax.device_put(labels, label_sharding(mesh)),
    )


def replicate_state(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, replicated(mesh))
