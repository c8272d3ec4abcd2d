"""Checkpoint/resume via orbax — the reference's ``save_checkpoint`` +
``--resume`` capability (SURVEY.md §3.4, §5.3, §5.4).

Layout: one orbax step directory per epoch holding the full TrainState pytree
({step, params, batch_stats, opt_state, rng}) plus scalar metadata
{epoch, best_acc1}. Two managers:

  * the main manager keeps the **latest** ``max_to_keep`` checkpoints
    (pure recency — ``restore()`` resumes exactly where training stopped);
  * a ``best/`` sub-manager holds the single best-by-acc1 checkpoint —
    the reference's ``model_best.pth.tar`` copy-on-improvement.

Keeping the retention policies separate matters: a single manager with
``best_fn`` + ``max_to_keep`` retains the best-N, so an interrupted run
would silently resume from an old high-watermark epoch instead of the
latest one. Orbax gives atomic writes and garbage collection (strictly
better than the reference's single mutable .pth.tar); rank-0 coordination
is handled by orbax in multi-host runs.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp

from mnasnet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 track_best: bool = True):
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
            ),
        )
        self._best_mgr = None
        if track_best:
            self._best_mgr = ocp.CheckpointManager(
                os.path.join(directory, "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    create=True,
                ),
            )

    @staticmethod
    def _payload(epoch: int, state: TrainState, best_acc1: float) -> dict:
        return {
            "state": dataclasses.asdict(state),
            "meta": {
                "epoch": np.asarray(epoch, np.int32),
                "best_acc1": np.asarray(best_acc1, np.float32),
            },
        }

    def save(
        self,
        epoch: int,
        state: TrainState,
        acc1: float,
        best_acc1: float,
        wait: bool = False,
        is_best: bool = False,
    ) -> None:
        payload = self._payload(epoch, state, best_acc1)
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(payload),
            metrics={"acc1": float(acc1)},
        )
        if is_best and self._best_mgr is not None:
            self._best_mgr.save(epoch, args=ocp.args.StandardSave(payload))
        if wait:
            self.wait()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_epoch(self) -> Optional[int]:
        if self._best_mgr is None:
            return None
        return self._best_mgr.latest_step()

    def restore(
        self,
        state_template: TrainState,
        epoch: Optional[int] = None,
        best: bool = False,
    ) -> tuple[TrainState, int, float]:
        """Returns (state, start_epoch, best_acc1); resumes the latest epoch
        if ``epoch`` is None, or the best-by-acc1 one if ``best``. The
        template supplies structure/dtypes/shardings (a freshly created
        TrainState)."""
        mgr = self._best_mgr if best else self._mgr
        if best and mgr is None:
            raise FileNotFoundError("no best-checkpoint tracking enabled")
        if epoch is None:
            epoch = mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError("no checkpoint to resume from")
        template = self._payload(0, state_template, 0.0)
        restored = mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)
        )
        state = TrainState(**restored["state"])
        start_epoch = int(restored["meta"]["epoch"]) + 1
        best_acc1 = float(restored["meta"]["best_acc1"])
        return state, start_epoch, best_acc1

    def restore_variables(
        self, epoch: Optional[int] = None, best: bool = False,
        use_ema: bool = False,
    ) -> tuple[dict, int, float]:
        """Template-free restore of just the model variables:
        ``({'params', 'batch_stats'}, epoch, best_acc1)``.

        The eval path must not need to reconstruct the training-time
        optimizer (or its fused/packed state layout) to read weights —
        orbax restores the raw saved pytree without an item template, and
        the optimizer state is simply ignored. ``use_ema=True`` instead
        returns the weight-moving-average shadow params the ``--model-ema``
        recipe stores in the optimizer state (train/optim.py
        ``with_model_ema``) — the weights the TF recipe evaluates."""
        mgr = self._best_mgr if best else self._mgr
        if best and mgr is None:
            raise FileNotFoundError("no best-checkpoint tracking enabled")
        if epoch is None:
            epoch = mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError("no checkpoint to restore")
        restored = mgr.restore(epoch)
        state = restored["state"]
        params = state["params"]
        if use_ema:
            from mnasnet_tpu.train.optim import get_ema_params

            params = get_ema_params(state["opt_state"])
            if params is None:
                raise ValueError(
                    "checkpoint has no model-EMA shadow params (was the run "
                    "trained with --model-ema?)"
                )
        variables = {
            "params": params,
            "batch_stats": state["batch_stats"],
        }
        return (
            variables,
            int(restored["meta"]["epoch"]),
            float(restored["meta"]["best_acc1"]),
        )

    def wait(self):
        self._mgr.wait_until_finished()
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.close()
