"""Checkpoint/resume via orbax — the reference's ``save_checkpoint`` +
``--resume`` capability (SURVEY.md §3.4, §5.3, §5.4).

Layout: one orbax step directory per epoch holding the full TrainState pytree
({step, params, batch_stats, opt_state, rng}) plus scalar metadata
{epoch, best_acc1}. Best-tracking mirrors the reference's ``model_best``
copy-on-improvement; orbax gives atomic writes and ``max_to_keep`` garbage
collection (strictly better than the reference's single mutable .pth.tar).
Async-capable; rank-0 coordination is handled by orbax in multi-host runs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp

from mnasnet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m["acc1"],
                best_mode="max",
                keep_checkpoints_without_metrics=True,
                create=True,
            ),
        )

    def save(
        self,
        epoch: int,
        state: TrainState,
        acc1: float,
        best_acc1: float,
        wait: bool = False,
    ) -> None:
        payload = {
            "state": dataclasses.asdict(state),
            "meta": {
                "epoch": np.asarray(epoch, np.int32),
                "best_acc1": np.asarray(best_acc1, np.float32),
            },
        }
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(payload),
            metrics={"acc1": float(acc1)},
        )
        if wait:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_epoch(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(
        self, state_template: TrainState, epoch: Optional[int] = None
    ) -> tuple[TrainState, int, float]:
        """Returns (state, start_epoch, best_acc1); resumes the latest epoch
        if ``epoch`` is None. The template supplies structure/dtypes/shardings
        (a freshly created TrainState)."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError("no checkpoint to resume from")
        template = {
            "state": dataclasses.asdict(state_template),
            "meta": {
                "epoch": np.asarray(0, np.int32),
                "best_acc1": np.asarray(0.0, np.float32),
            },
        }
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)
        )
        state = TrainState(**restored["state"])
        start_epoch = int(restored["meta"]["epoch"]) + 1
        best_acc1 = float(restored["meta"]["best_acc1"])
        return state, start_epoch, best_acc1

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
