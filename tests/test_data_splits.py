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


def test_physionet_true_seed(pn):
    """The train-balance sampling seed is 18 unless overridden
    (dataloader_physionet.py:81-84): a different true_seed draws a
    different representative subset; TrainConfig wires it through both as
    an explicit field and via the notebook's 'base-trueseed=N' run label
    (experiments_timeseries.ipynb cell 11)."""
    from pcgmix_tpu.train import TrainConfig
    from pcgmix_tpu.train.loop import build_splits

    import copy

    base = physionet_split(pn, "train", train_balance=True)
    same = physionet_split(pn, "train", train_balance=True, tbal_seed=18)
    np.testing.assert_array_equal(base.wav, same.wav)

    # on CLASS-BALANCED data sampling keeps every wav whatever the seed, so
    # drop two label-1 wavs to force real subset selection
    d = copy.deepcopy(pn)
    tr = d["train"]
    wavs1 = sorted({w for w, t in zip(tr["wav"], tr["label"]) if t == 1})
    drops = {wavs1[0], wavs1[-1]}
    keep = np.array([w not in drops for w in tr["wav"]])
    for k in ("label", "frames", "wav", "sig_qual"):
        tr[k] = np.asarray(tr[k])[keep]
    tr["data"] = {b: np.asarray(v)[keep] for b, v in tr["data"].items()}
    ref18 = set(physionet_split(d, "train", train_balance=True, tbal_seed=18).wav)
    got21 = set(physionet_split(d, "train", train_balance=True, tbal_seed=21).wav)
    assert ref18 != got21  # deterministic: random.Random(21) draws differently

    cfg = TrainConfig(method="base-trueseed=19", loader_parity="numpy")
    via_label, _ = build_splits(cfg, pn)
    cfg2 = TrainConfig(method="base", true_seed=19, loader_parity="numpy")
    via_field, _ = build_splits(cfg2, pn)
    np.testing.assert_array_equal(via_label.wav, via_field.wav)
    ref = physionet_split(pn, "train", train_balance=True, tbal_seed=19)
    np.testing.assert_array_equal(via_label.wav, ref.wav)


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
