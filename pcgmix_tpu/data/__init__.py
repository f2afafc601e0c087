"""Datasets, split logic, loaders and the offline builder (SURVEY.md §2
components 4-6, 13).

The reference wraps in-memory numpy arrays in torch Datasets/DataLoaders
(dataloader_physionet.py, dataloader_umc.py, *2d).  The whole corpus is tens
of MB, so here a split is just an :class:`ArrayDataset` of packed numpy
arrays; an epoch is an index permutation; batches are device uploads of
contiguous gathers.  Split/selection logic is reproduced bit-exactly
(seeded stdlib-random subsampling, fold construction).
"""

from pcgmix_tpu.data.datasets import ArrayDataset, bands_to_channels
from pcgmix_tpu.data.loader import EpochIterator, eval_batches
from pcgmix_tpu.data.physionet import physionet_split
from pcgmix_tpu.data.umc import umc_split
from pcgmix_tpu.data.synthetic import (
    synthetic_effect_dict,
    synthetic_physionet_dict,
    synthetic_physionet_full_dict,
    synthetic_spectrogram_dict,
)

__all__ = [
    "ArrayDataset",
    "bands_to_channels",
    "EpochIterator",
    "eval_batches",
    "physionet_split",
    "umc_split",
    "synthetic_effect_dict",
    "synthetic_physionet_dict",
    "synthetic_physionet_full_dict",
    "synthetic_spectrogram_dict",
]
