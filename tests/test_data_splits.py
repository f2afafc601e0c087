"""Split-logic and loader tests."""

import numpy as np
import pytest

from pcgmix_tpu.data import (
    physionet_split,
    synthetic_physionet_dict,
    umc_split,
    EpochIterator,
    eval_batches,
)
from pcgmix_tpu.data.synthetic import synthetic_umc_dict
from pcgmix_tpu.data.umc import ALL_PATIENTS, HELDOUT_GROUPS


@pytest.fixture(scope="module")
def pn():
    return synthetic_physionet_dict(num_wavs_train=36, num_wavs_test=8, seed=3)


def test_physionet_train_balance_and_quality(pn):
    ds = physionet_split(pn, "train", train_balance=True)
    assert np.all(ds.sig_qual != 0)
    # train balance equalizes classes per subset letter at the wav level
    wavs = {}
    for w, t in zip(ds.wav, ds.label):
        wavs.setdefault(w[0], set()).add((w, int(t)))
    for letter, pairs in wavs.items():
        n0 = sum(1 for _, t in pairs if t == 0)
        n1 = sum(1 for _, t in pairs if t == 1)
        assert n0 == n1, f"subset {letter}: {n0} vs {n1}"


def test_physionet_nfraction_monotone(pn):
    full = physionet_split(pn, "train", n_fraction=1.0)
    half = physionet_split(pn, "train", n_fraction=0.5, seed_data=1010001)
    small = physionet_split(pn, "train", n_fraction=0.2, seed_data=1010001)
    assert len(set(half.wav)) < len(set(full.wav))
    assert set(small.wav) <= set(half.wav)  # nested prefixes of one shuffle
    # per-class counts equal after n_fraction (dataloader_physionet.py:94-105)
    labels_by_wav = {w: t for w, t in zip(half.wav, half.label)}
    vals = list(labels_by_wav.values())
    assert vals.count(0) == vals.count(1)


def test_physionet_valid_folds_partition(pn):
    folds = []
    for seed in range(1, 6):
        v = physionet_split(pn, "valid", valid=True, seed=seed)
        folds.append(set(v.wav))
        t = physionet_split(pn, "train", valid=True, seed=seed)
        assert not (set(t.wav) & set(v.wav))
    allv = set().union(*folds)
    assert sum(len(f) for f in folds) == len(allv)  # disjoint folds


def test_umc_folds(pn):
    d = synthetic_umc_dict()
    for seed_data in (1, 5, 10):
        tr = umc_split(d, "train", seed_data=seed_data)
        te = umc_split(d, "test", seed_data=seed_data)
        held = set(HELDOUT_GROUPS[seed_data - 1])
        assert set(te.ids) == held
        assert set(tr.ids) == set(ALL_PATIENTS) - held
    with pytest.raises(ValueError):
        umc_split(d, "train", seed_data=11)


def test_umc_label_swap():
    d = synthetic_umc_dict()
    tr = umc_split(d, "train", seed_data=1)
    # all retained indices keep swapped labels
    orig = {w: l for w, l in zip(d["wav"], d["label"])}
    for w, l in zip(tr.wav, tr.label):
        assert l == (orig[w] ^ 1)


def test_epoch_iterator_torch_parity(pn):
    import torch

    ds = physionet_split(pn, "train")
    it = EpochIterator(ds, 16, seed=1, step_count=7, parity="torch")
    torch.manual_seed(1 * 635410 + 7)
    expected = torch.randperm(len(ds)).numpy()
    np.testing.assert_array_equal(it.order, expected)
    batches = list(it)
    assert len(batches) == len(ds) // 16  # drop_last
    assert batches[0]["data"].shape == (16,) + ds.data.shape[1:]


def test_eval_batches_padding(pn):
    ds = physionet_split(pn, "train")
    total = 0
    for b in eval_batches(ds, batch_size=50):
        assert b["data"].shape[0] == 50
        total += int(b["mask"].sum())
    assert total == len(ds)
