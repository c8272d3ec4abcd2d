"""Host input pipeline: decode/augment workers + double-buffered device
prefetch — the TPU-native replacement for torch's DataLoader core
(SURVEY.md §2.3 N8).

The reference overlaps JPEG decode with GPU compute via worker *processes*,
shared-memory tensor transport and a pin-memory thread. On TPU hosts the
equivalent overlap is:

  * a thread pool decoding/augmenting ahead of the step (PIL releases the GIL
    in libjpeg decode, and the device step itself releases the GIL while XLA
    runs, so threads — not processes — give the overlap without shm/pickle
    transport costs on this single-socket host);
  * batches assembled into fixed-shape NHWC float32 arrays (static shapes —
    an XLA requirement the torch stack never had to think about);
  * ``prefetch_to_device``: a depth-2 queue of batches already transferred
    (``jax.device_put``) so the H2D copy of batch N+1 rides under the compute
    of batch N — the pinned-DMA double-buffering equivalent.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import jax
import numpy as np

# Debug/verification hook: when set, every batch the loader YIELDS is
# appended to this path as one JSON line {epoch, batch, indices, n_valid}
# (indices = the batch AS YIELDED, so a padded tail batch INCLUDES its
# wrap-padding indices; n_valid = real samples in a padded tail, null for
# full batches — consumers must slice indices[:n_valid], as
# tools/multihost_data.py and the tests do, or they double-count the
# wrapped samples). Used by tools/multihost_data.py to prove the
# DistributedSampler contract on real on-disk data: the union of valid
# indices across all hosts' logs covers every sample exactly once per epoch
# (SURVEY.md §2.3 N8 "per-host sharding"). Off (no overhead) unless set.
_CONSUMED_LOG_ENV = "MNASNET_TPU_CONSUMED_LOG"

from mnasnet_tpu.data.dataset import shard_indices
from mnasnet_tpu.parallel import mesh as _mesh


class DataLoader:
    """Iterates (images NHWC fp32, labels int32) host batches for one epoch.

    transform(img: PIL, rng) → HWC float32; rng is derived per (seed, epoch,
    index) so augmentation is reproducible regardless of worker scheduling
    (SURVEY.md §2.3 N10, §5.2 --deterministic).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        transform: Callable,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        workers: int = 4,
        shard_id: int = 0,
        num_shards: int = 1,
        augment: bool = True,
        bytes_transform: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._fallback_count = 0  # native-decoder → PIL per-image fallbacks
        self._fallback_lock = threading.Lock()  # workers increment concurrently
        self.seed = seed
        self.workers = workers
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.augment = augment
        # Optional native fused-decoder path: called with (jpeg_bytes[, rng])
        # when the dataset exposes raw JPEG bytes; falls back to the PIL
        # ``transform`` per sample otherwise (mixed datasets work).
        self.bytes_transform = bytes_transform

    @property
    def fallback_count(self) -> int:
        """Total native-decoder→PIL per-image fallbacks so far (exact;
        incremented under a lock). The warn log only samples occurrences
        1/100/10k-multiples, so consumers that need the real number — the
        dress-rehearsal 'CMYK fired exactly once' check, ops dashboards —
        must read this, not count log lines."""
        with self._fallback_lock:
            return self._fallback_count

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        per_shard = (
            (n // self.num_shards)
            if self.drop_last
            else -(-n // self.num_shards)
        )
        return (
            per_shard // self.batch_size
            if self.drop_last
            else -(-per_shard // self.batch_size)
        )

    def _load_one(self, epoch: int, index: int):
        index = int(index)
        if self.bytes_transform is not None and hasattr(self.dataset, "load_bytes"):
            data, label = self.dataset.load_bytes(index)
            if data is not None:
                try:
                    if self.augment:
                        rng = np.random.default_rng((self.seed, epoch, index))
                        return self.bytes_transform(data, rng), label
                    return self.bytes_transform(data), label
                except Exception as e:
                    # Per-image PIL fallback: the native decoder rejects
                    # JPEGs libjpeg can't hand back as RGB (CMYK/YCCK —
                    # real ImageNet contains a few); PIL converts them.
                    # Count + warn so a SYSTEMIC decoder failure (misbuilt
                    # .so, ABI break) degrading every image to the slow
                    # path is visible, not silent.
                    with self._fallback_lock:
                        self._fallback_count += 1
                        count = self._fallback_count
                    if count in (1, 100) or count % 10000 == 0:
                        print(
                            f"warning: native decode failed "
                            f"({type(e).__name__}: {e}); PIL fallback "
                            f"(occurrence #{count})",
                            flush=True,
                        )
        img, label = self.dataset.load(index)
        if self.augment:
            rng = np.random.default_rng((self.seed, epoch, index))
            arr = self.transform(img, rng)
        else:
            arr = self.transform(img)
        return arr, label

    def epoch(
        self, epoch: int = 0, start_step: int = 0
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yield the epoch's batches, optionally starting at batch index
        ``start_step`` (mid-epoch resume after preemption: the skipped
        batches are the ones the interrupted run already consumed — same
        (seed, epoch)-keyed order — and are never decoded)."""
        indices = shard_indices(
            len(self.dataset),
            epoch,
            shuffle=self.shuffle,
            seed=self.seed,
            shard_id=self.shard_id,
            num_shards=self.num_shards,
            drop_last=self.drop_last,
        )
        bs = self.batch_size
        n_full = len(indices) // bs
        ends = n_full * bs
        batches = [indices[i * bs:(i + 1) * bs] for i in range(n_full)]
        n_valid_tail = None
        if not self.drop_last and ends < len(indices):
            # Pad the tail batch by wrapping — static shapes for XLA. Padded
            # positions get label −1 at collate time; the loss/metrics mask
            # them out, so eval accuracy is exact.
            tail = indices[ends:]
            n_valid_tail = len(tail)
            pad = np.resize(indices[: max(1, ends)] if ends else tail, bs - len(tail))
            batches.append(np.concatenate([tail, pad]))

        last = len(batches) - 1

        def valid(bi: int) -> Optional[int]:
            return n_valid_tail if bi == last and n_valid_tail is not None else None

        if not 0 <= start_step <= len(batches):
            raise ValueError(
                f"start_step {start_step} out of range for an epoch of "
                f"{len(batches)} batches"
            )
        # Keep original batch indices so the padded-tail masking (valid())
        # is unaffected by where iteration starts.
        todo = list(enumerate(batches))[start_step:]

        log_path = os.environ.get(_CONSUMED_LOG_ENV)

        def log_consumed(bi: int, batch_idx) -> None:
            if not log_path:
                return
            with open(log_path, "a") as f:
                f.write(json.dumps({
                    # dataset length disambiguates loaders sharing one log
                    # (train vs val have different sizes)
                    "n": len(self.dataset),
                    "epoch": epoch, "batch": bi,
                    "indices": [int(i) for i in batch_idx],
                    "n_valid": valid(bi),
                }) + "\n")

        if self.workers <= 0:
            for bi, batch_idx in todo:
                pairs = [self._load_one(epoch, i) for i in batch_idx]
                log_consumed(bi, batch_idx)
                yield self._collate(pairs, valid(bi))
            return

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            # Pipeline two batches ahead of the consumer.
            pending = []
            it = iter(todo)
            for _ in range(2):
                nb = next(it, None)
                if nb is not None:
                    pending.append(
                        (nb[0], [pool.submit(self._load_one, epoch, i) for i in nb[1]])
                    )
            while pending:
                bi, futs = pending.pop(0)
                nb = next(it, None)
                if nb is not None:
                    pending.append(
                        (nb[0], [pool.submit(self._load_one, epoch, i) for i in nb[1]])
                    )
                log_consumed(bi, batches[bi])
                yield self._collate([f.result() for f in futs], valid(bi))

    @staticmethod
    def _collate(pairs, n_valid: Optional[int] = None) -> tuple[np.ndarray, np.ndarray]:
        images = np.stack([p[0] for p in pairs]).astype(np.float32)
        labels = np.asarray([p[1] for p in pairs], dtype=np.int32)
        if n_valid is not None:
            labels[n_valid:] = -1  # padding sentinel, masked by loss/metrics
        return images, labels


def prefetch_to_device(
    iterator: Iterator,
    *,
    size: int = 2,
    sharding=None,
    dtype=None,
) -> Iterator:
    """Wrap a host-batch iterator so device transfer overlaps compute.

    A daemon thread pulls host batches, casts images to ``dtype`` (bf16 cast
    on host halves H2D bytes), issues ``jax.device_put`` (async on TPU), and
    keeps ``size`` in-flight — the double-buffered pinned-DMA equivalent
    (SURVEY.md §2.3 N8). ``sharding`` may be a single sharding or a tuple
    (images_sharding, labels_sharding) for sharded placement.

    Multi-host: when ``jax.process_count() > 1`` each host's batches are its
    per-process shard of the global batch, so placement goes through
    ``jax.make_array_from_process_local_data`` (SURVEY.md §2.6) instead of a
    plain ``device_put``.

    Loader exceptions (e.g. a corrupt image) are re-raised in the consumer —
    never swallowed as a silently truncated epoch — and an early consumer
    exit (exception mid-epoch) unblocks and stops the producer thread.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def place(images, labels):
        if isinstance(sharding, tuple):
            # The one multi-host-aware placement path (parallel.mesh).
            return _mesh.place_batch(images, labels, sharding[0], sharding[1])
        if _mesh._process_count() > 1:
            raise ValueError(
                "multi-host placement needs explicit (images, labels) "
                "shardings"
            )
        if sharding is None:
            return jax.device_put((images, labels))
        return jax.device_put((images, labels), sharding)

    def put(batch):
        images, labels = batch
        if dtype is not None:
            images = images.astype(dtype)
        return place(images, labels)

    def enqueue(item) -> bool:
        """Blocking put that aborts when the consumer has gone away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not enqueue(put(batch)):
                    return
        except BaseException as e:  # re-raised in the consumer
            enqueue(_Failure(e))
        else:
            enqueue(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, _Failure):
                raise item.exc
            yield item
    finally:
        stop.set()
        while True:  # drain so a blocked producer put() unblocks promptly
            try:
                q.get_nowait()
            except queue.Empty:
                break


class _Failure:
    """Wraps a producer-side exception for re-raise in the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


