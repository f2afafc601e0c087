"""Serving path: checkpoint → batched inference → recording decisions."""

import os

import numpy as np
import pytest

from pcgmix_tpu.data import physionet_split, synthetic_physionet_dict
from pcgmix_tpu.exp import experiment_dir
from pcgmix_tpu.serve import Classifier
from pcgmix_tpu.train import TrainConfig, train_model


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=10, segments_per_wav=3, sig_len=512,
        seed=8,
    )
    cfg = TrainConfig(
        model="resnet9-5k", method="base", num_epochs=6, batch_size=16,
        sig_len=512, experiments_root=root, loader_parity="numpy", plot=False,
    )
    train_model(cfg, ds)
    return cfg, ds


def test_classifier_roundtrip(trained):
    cfg, ds = trained
    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    clf = Classifier.from_checkpoint(
        ckpt, "resnet9-5k", sig_len=512, batch_size=32
    )
    test = physionet_split(ds, "test")
    probs = clf.predict_proba(test.data)
    assert probs.shape == (len(test), 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
    preds = clf.predict_recordings(test.data, test.wav)
    assert len(preds) == len(set(test.wav))
    by_wav = {w: int(t) for w, t in zip(test.wav, test.label)}
    acc = np.mean([p.pred == by_wav[p.wav] for p in preds]) * 100
    assert acc >= 70.0  # the trained model generalizes on the synthetic task


def test_serve_cli(trained, tmp_path, capsys):
    cfg, ds = trained
    from pcgmix_tpu import serve, utils

    path = str(tmp_path / "d.dat")
    utils.dict2file(ds, path)
    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    serve.main([
        "--checkpoint", ckpt, "--model", "resnet9-5k",
        "--dataset-file", path, "--split", "test",
    ])
    out = capsys.readouterr().out
    assert "p_abnormal=" in out and "recording accuracy" in out
