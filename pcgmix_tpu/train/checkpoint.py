"""Mid-training checkpointing with orbax (crash recovery / resume).

The reference saves only final weights at the end of training
(train_model.py:481-482) and "resumes" grids by skipping finished run dirs
(utils.py:26-32).  This module adds what SURVEY.md §5 calls for in the
rebuild: periodic full-state checkpoints (params + optimizer state + SELC
table + step) so an interrupted run continues mid-training.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Optional

import jax
import orbax.checkpoint as ocp

from pcgmix_tpu.train.steps import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2):
        self._dir = os.path.abspath(directory)
        self._max_to_keep = max_to_keep
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState,
             metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if metrics is not None:
            with open(os.path.join(self._dir, f"metrics_{step}.pkl"), "wb") as f:
                pickle.dump(metrics, f)
            kept = sorted(
                glob.glob(os.path.join(self._dir, "metrics_*.pkl")),
                key=lambda q: int(q.rsplit("_", 1)[1].split(".")[0]),
            )
            for old in kept[: -self._max_to_keep]:
                os.remove(old)

    def restore_metrics(self, step: int) -> Optional[dict]:
        """Metric history saved alongside the state checkpoint — without it a
        resumed run's performance.pkl would silently lose the pre-crash
        training curve and restart 'times' at zero."""
        path = os.path.join(self._dir, f"metrics_{step}.pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    @property
    def directory(self) -> str:
        return self._dir

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState) -> tuple[TrainState, int]:
        """Restore the latest checkpoint into the template's structure."""
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_template)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return restored, int(step)

    def close(self):
        self._mgr.close()
