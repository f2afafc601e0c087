"""Epoch iteration and batching.

The reference relies on torch DataLoader(shuffle=True, drop_last=True) with
the global torch RNG reseeded every epoch to ``seed·635410 + step_count``
(train_model.py:497), and batch-1000 sequential eval loaders
(dataloader_physionet.py:247-251).  Here an epoch is one permutation of
indices; batches are contiguous gathers of the packed arrays.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pcgmix_tpu.data.datasets import ArrayDataset


def epoch_permutation(n: int, seed: int, step_count: int, parity: str = "torch"):
    """Shuffle order for one epoch.

    parity='torch' reproduces the reference order exactly:
    torch.manual_seed(seed·635410 + step_count) then torch.randperm(n)
    (what DataLoader's RandomSampler draws).  parity='numpy' is a fast
    deterministic alternative with the same seeding contract.
    """
    s = seed * 635410 + step_count
    if parity == "torch":
        import torch

        torch.manual_seed(s)
        return torch.randperm(n).numpy()
    return np.random.RandomState(s % (2**32)).permutation(n)


class EpochIterator:
    """Training batches for one epoch: (data, label, frames, wav, sig_qual,
    indices) — the reference loader's tuple (dataloader_physionet.py:151-160),
    with `indices` the global sample ids SELC scatters by."""

    def __init__(
        self,
        ds: ArrayDataset,
        batch_size: int,
        seed: int,
        step_count: int,
        parity: str = "torch",
        materialize_data: bool = True,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.materialize_data = materialize_data
        self.order = epoch_permutation(len(ds), seed, step_count, parity)

    def __len__(self) -> int:
        return len(self.ds) // self.batch_size  # drop_last=True

    def __iter__(self) -> Iterator[dict]:
        bs = self.batch_size
        for b in range(len(self)):
            idx = self.order[b * bs : (b + 1) * bs]
            out = {
                "label": self.ds.label[idx],
                "frames": self.ds.frames[idx],
                "wav": self.ds.wav[idx],
                "sig_qual": self.ds.sig_qual[idx],
                "indices": idx,
            }
            if self.materialize_data:
                # skipped in device-resident mode: the jitted step gathers
                # rows from the HBM-staged corpus by `indices`
                out["data"] = self.ds.data[idx]
            yield out


def eval_batches(
    ds: ArrayDataset, batch_size: int = 1000, pad_to_batch: bool = True
) -> Iterator[dict]:
    """Sequential eval batches.  The last batch is zero-padded to a full
    batch (with a validity mask) so the jitted eval step sees one static
    shape; reference behavior is sequential ragged batches
    (dataloader_physionet.py:247-251) — metrics are identical because padded
    rows carry weight 0."""
    n = len(ds)
    for b in range(0, n, batch_size):
        idx = np.arange(b, min(b + batch_size, n))
        valid = len(idx)
        if pad_to_batch and valid < batch_size:
            idx = np.concatenate([idx, np.zeros(batch_size - valid, np.int64)])
        yield {
            "data": ds.data[idx],
            "label": ds.label[idx],
            "frames": ds.frames[idx],
            "wav": ds.wav[idx],
            "mask": (np.arange(len(idx)) < valid),
        }
