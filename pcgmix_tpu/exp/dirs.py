"""Run-directory naming and resume checks.

The reference encodes every hyperparameter into the run directory name
(utils.experiment_dir, utils.py:34-53) and treats the existence of the final
checkpoint as "experiment done" (utils.py:26-32) — grid loops skip finished
runs.  We keep the exact naming contract (so results directories from either
implementation interoperate) but our checkpoint is ``model.msgpack``; the
done-check accepts either artifact.
"""

from __future__ import annotations

import os


def experiment_dir(cfg, experiments_root: str | None = None) -> str:
    """Directory name encoding the full config (utils.py:34-53 contract).

    cfg is any object with the reference's args attributes (TrainConfig
    provides them).
    """
    root = experiments_root or getattr(cfg, "experiments_root", "experiments")
    name = (
        f"{cfg.dataset}_{cfg.model}_{cfg.method}_epochs={cfg.num_epochs}"
        f"_bs={cfg.batch_size}_nfrac={cfg.n_fraction}_op={cfg.op}"
        f"_sched={cfg.use_sched}_lrmax={cfg.lr_max}_tbal={cfg.train_balance}"
        f"_chs={cfg.num_channels}_gc={cfg.grad_clip}_seed(data)={cfg.seed_data}"
        f"_valid={cfg.valid}_seed={cfg.seed}"
    )
    return os.path.join(root, name)


def experiment_already_done(cfg, experiments_root: str | None = None) -> bool:
    """True iff a final checkpoint exists (utils.py:26-32)."""
    d = experiment_dir(cfg, experiments_root)
    return any(
        os.path.exists(os.path.join(d, f)) for f in ("model.msgpack", "model.pth")
    )
