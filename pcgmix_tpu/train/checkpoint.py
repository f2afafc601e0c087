"""Mid-training checkpointing with orbax (crash recovery / resume).

The reference saves only final weights at the end of training
(train_model.py:481-482) and "resumes" grids by skipping finished run dirs
(utils.py:26-32).  This module adds what SURVEY.md §5 calls for in the
rebuild: periodic full-state checkpoints (params + optimizer state + SELC
table + step) so an interrupted run continues mid-training.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from pcgmix_tpu.train.steps import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

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
