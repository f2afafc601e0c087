"""Classical-ML subsystem (SURVEY.md §2 component 12).

Per-segment hand-crafted features (~350), envelope-based segment pruning,
rolling mean/SD aggregation per recording, and a multi-classifier sklearn
bench with mutual-information feature selection and recording-level
majority voting — the reference's classical.py pipeline.
"""

from pcgmix_tpu.classical.features import feature_vector_seg, extract_features
from pcgmix_tpu.classical.experiment import (
    remove_segments_mean_envelope,
    aggregate_features_rolling,
    aggregate_features_single,
    collect_augmentation_features,
    export_nfrac_wav_subsets,
    merge_augmentation_features,
    run_experiment,
)

__all__ = [
    "collect_augmentation_features",
    "merge_augmentation_features",
    "feature_vector_seg",
    "extract_features",
    "remove_segments_mean_envelope",
    "aggregate_features_rolling",
    "aggregate_features_single",
    "export_nfrac_wav_subsets",
    "run_experiment",
]
