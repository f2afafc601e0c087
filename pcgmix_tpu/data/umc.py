"""UMC heart-failure dataset split logic.

Bit-exact reimplementation of dataloader_umc.py:26-150 (and its 2-D analogue
dataloader_umc2d.py): label swap, exclusion filter, the hardcoded 10-fold
patient cross-validation, signal-quality filter, and the inner 3-fold
validation split over old/new recording subsets.

The reference hardcodes ten 33/34-patient train folds
(dataloader_umc.py:63-72).  Those folds are exactly "all 37 patients minus
one held-out group", and the ten held-out groups partition the cohort, so we
store the compact group table (fold membership is all that is ever used —
``id in selected_fold`` — so order is immaterial).
"""

from __future__ import annotations

import numpy as np

from pcgmix_tpu.data.datasets import ArrayDataset

# Held-out patient groups; train fold i (1-based) = all patients except
# HELDOUT_GROUPS[i-1].  Derived from dataloader_umc.py:63-72.
HELDOUT_GROUPS = [
    ["ID_002", "ID_1", "ID_19", "ID_2"],
    ["ID_013", "ID_16", "ID_9"],
    ["ID_008", "ID_10", "ID_22"],
    ["ID_000", "ID_15", "ID_3"],
    ["ID_003", "ID_007", "ID_11", "ID_12"],
    ["ID_004", "ID_014", "ID_14", "ID_23"],
    ["ID_001", "ID_009", "ID_4", "ID_8"],
    ["ID_011", "ID_012", "ID_24", "ID_7"],
    ["ID_005", "ID_006", "ID_13", "ID_6"],
    ["ID_010", "ID_015", "ID_20", "ID_5"],
]
ALL_PATIENTS = sorted({p for g in HELDOUT_GROUPS for p in g})


def swap_umc_labels(labels: np.ndarray) -> np.ndarray:
    """The rekomp=0/dekomp=1 class swap applied right after from_dict
    (dataloader_umc.py:42).  Shared by umc_split and the gang trainer's
    base rebuild (train/gang.py) so the transform cannot drift apart."""
    return np.where((labels == 0) | (labels == 1), labels ^ 1, labels)


def _train_fold(seed_data: int) -> set:
    if seed_data not in range(1, 11):
        raise ValueError(f"seed_data must be in 1..10 (10-fold CV), got {seed_data}")
    held = set(HELDOUT_GROUPS[seed_data - 1])
    return {p for p in ALL_PATIENTS if p not in held}


def umc_split(
    dataset: dict,
    mode: str,
    *,
    num_channels: int = 4,
    seed_data: int = 1,
    seed: int = 1,
    valid: bool = False,
    classical_space: bool = False,
    spectrogram: bool = False,
) -> ArrayDataset:
    """Materialize one split of a UMC dataset dict (single dict, no
    train/test level — splits are by patient folds)."""
    ds = ArrayDataset.from_dict(dataset, num_channels, classical_space, spectrogram)
    # swap classes to rekomp=0, dekomp=1 (dataloader_umc.py:42)
    ds.label = swap_umc_labels(ds.label)
    # keep only non-excluded recordings (dataloader_umc.py:48-56)
    ds = ds.take([i for i, ex in enumerate(np.asarray(dataset["excluded"])) if ex == 1])

    fold = _train_fold(seed_data)
    if mode == "test":
        return ds.take([i for i, pid in enumerate(ds.ids) if pid not in fold])

    ds = ds.take([i for i, pid in enumerate(ds.ids) if pid in fold])
    # signal-quality filter (dataloader_umc.py:103-110)
    ds = ds.take(np.nonzero(ds.sig_qual)[0])

    if valid:
        # old/new subset bucketing: 'new' ids are 6 chars (ID_xxx), 'old'
        # shorter (dataloader_umc.py:111-123)
        old_ids, new_ids, seen = [], [], set()
        for pid in ds.ids:
            if pid not in seen:
                seen.add(pid)
                (new_ids if len(pid) == 6 else old_ids).append(pid)
        k = 3
        if seed not in range(1, k + 1):
            raise ValueError(f"seed must be in 1..{k} (3-fold CV), got {seed}")
        parts_old = [old_ids[i::k] for i in range(k)]
        parts_new = [new_ids[i::k] for i in range(k)]
        folds = [parts_old[i] + parts_new[k - i - 1] for i in range(k)]
        ids_valid = set(folds[seed - 1])
        if mode == "valid":
            return ds.take([i for i, pid in enumerate(ds.ids) if pid in ids_valid])
        ids_train = [p for f in folds for p in f if p not in ids_valid]
        tset = set(ids_train)
        return ds.take([i for i, pid in enumerate(ds.ids) if pid in tset])
    if mode == "valid":
        raise ValueError("mode='valid' requires valid=True")
    return ds
