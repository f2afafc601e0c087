"""Experiment management: run-dir naming, robust hyperparameter schedules,
results reading (SURVEY.md §2 components 14-15)."""

from pcgmix_tpu.exp.dirs import experiment_dir, experiment_already_done
from pcgmix_tpu.exp.robust import hyperparameters_robust, SEED_DATA_GRIDS
from pcgmix_tpu.exp.results import (
    read_experiments_all_dataseeds,
    read_performance,
    results_table,
)
from pcgmix_tpu.exp.paper import (
    paper_table,
    propagate_error,
    relative_improvement_over_vanilla,
)

__all__ = [
    "paper_table",
    "propagate_error",
    "relative_improvement_over_vanilla",
    "experiment_dir",
    "experiment_already_done",
    "hyperparameters_robust",
    "SEED_DATA_GRIDS",
    "read_experiments_all_dataseeds",
    "read_performance",
    "results_table",
]
