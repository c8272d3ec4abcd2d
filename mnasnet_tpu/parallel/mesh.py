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
        devices = _slice_major(devices, dcn, data * spatial)
        arr = np.asarray(devices).reshape(dcn, data, spatial)
        return Mesh(arr, axis_names=("dcn", "data", "spatial"))
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def _slice_major(
    devices: Sequence[jax.Device], dcn: int, per_slice: int
) -> list:
    """Order devices slice-major so the leading 'dcn' mesh axis is
    slice-aligned.

    Platforms don't guarantee ``jax.devices()`` returns devices grouped by
    slice; a naive reshape could then put intra-slice gradient traffic on
    slow DCN links (numerics stay correct, so only topology-aware grouping —
    not a test — catches it). Devices exposing ``slice_index`` are grouped
    and validated against the requested mesh shape; devices without one
    (CPU meshes in tests) keep their given order.
    """
    slice_ids = [getattr(d, "slice_index", None) for d in devices]
    if all(s is None for s in slice_ids):
        return list(devices)
    if any(s is None for s in slice_ids):
        # Mixed exposure would otherwise surface as a TypeError from
        # sorted() over None/int keys, masking the real problem.
        raise ValueError(
            "devices heterogeneous in slice_index exposure: "
            f"{sorted({type(s).__name__ for s in slice_ids})} — cannot "
            "build a slice-aligned dcn mesh from this device list"
        )
    by_slice: dict = {}
    for d, s in zip(devices, slice_ids):
        by_slice.setdefault(s, []).append(d)
    if len(by_slice) != dcn:
        raise ValueError(
            f"dcn={dcn} but devices span {len(by_slice)} slices "
            f"({sorted(by_slice)})"
        )
    sizes = {s: len(ds) for s, ds in by_slice.items()}
    if any(n != per_slice for n in sizes.values()):
        raise ValueError(
            f"data*spatial={per_slice} must equal the per-slice device "
            f"count; got {sizes}"
        )
    return [d for s in sorted(by_slice) for d in by_slice[s]]


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


def place_batch(images: Any, labels: Any, images_sharding, labels_sharding):
    """THE multi-host-aware batch placement — the single implementation both
    :func:`shard_batch` and ``data.pipeline.prefetch_to_device`` route
    through. Single-process: plain ``device_put``. Multi-process: each host
    holds its per-process shard, assembled into one global array via
    ``jax.make_array_from_process_local_data`` (SURVEY.md §2.6)."""
    if _process_count() > 1:
        return (
            _make_global_array(images_sharding, images),
            _make_global_array(labels_sharding, labels),
        )
    return (
        jax.device_put(images, images_sharding),
        jax.device_put(labels, labels_sharding),
    )


def shard_batch(mesh: Mesh, images: Any, labels: Any):
    """Place a host-(local|global) batch onto the mesh with the canonical
    batch/label shardings."""
    return place_batch(
        images, labels, batch_sharding(mesh), label_sharding(mesh)
    )


# Indirections so tests can exercise the multi-host placement branch on a
# single-process host (monkeypatched in tests/test_parallel.py).
def _process_count() -> int:
    return jax.process_count()


def _make_global_array(sharding, local_data):
    return jax.make_array_from_process_local_data(sharding, local_data)


def replicate_state(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, replicated(mesh))
