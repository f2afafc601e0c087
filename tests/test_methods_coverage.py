"""Smoke coverage: every 1-D/2-D method family trains end-to-end."""

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.data.synthetic import synthetic_spectrogram_dict, synthetic_umc_dict
from pcgmix_tpu.train import TrainConfig, train_model

DS = synthetic_physionet_dict(
    num_wavs_train=24, num_wavs_test=6, segments_per_wav=3, sig_len=512, seed=11
)


def _run(method, **kw):
    base = dict(
        dataset="PhysioNet", model="resnet9-5k", method=method, num_epochs=2,
        batch_size=16, sig_len=512, save_artifacts=False, loader_parity="numpy",
    )
    base.update(kw)
    perf = train_model(TrainConfig(**base), DS)
    assert np.isfinite(perf["train_loss"]).all(), method
    return perf


# one representative per handler family not covered elsewhere
METHODS_1D = [
    "mixup(same)",
    "mixup(mix)",
    "timemask(0.2)",
    "timewarp(0.05,2)",
    "magnitudewarp(0.2,4)",
    "gaussiannoise(25,40)",
    "respiratoryscale(12,20)",
    "durmixrespscale(12,20)",
    "(rand)durratiomixup",
    "(smooth)labelcutmix",
    "durratiocutmix",
    "lengthcutmix(5bins)",
    "datasetcutmix",
    "wavcutmix",
    "wav-durratiocutmix",
    "labelcutmix(rand)",
    "swapsysdia",
    "cont-cutmix",
    "cutmix",
    "cutmix(ch)",
    "cutout",
    "cutout(ch)",
    "s1s2mask",
    "saliency-cutmix",
    "lc-nointrusion",
    "(mixAll)durratiomixup",
]


@pytest.mark.parametrize("method", METHODS_1D)
def test_method_trains(method):
    _run(method)


def test_manifold_cutmix_fcn():
    _run("manifold-cutmix", model="FCN")


def test_manifold_cutout_fcn():
    _run("manifold-cutout", model="FCN")


def test_latentmixup_potes():
    _run("latentmixup", model="Potes")


def test_classical_space_run(tmp_path):
    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=4, segments_per_wav=2, sig_len=512, seed=3
    )
    cfg = TrainConfig(
        dataset="PhysioNet", model="resnet9-5k", method="durratiomixup",
        num_epochs=1, batch_size=8, sig_len=512, classical_space=True,
        experiments_root=str(tmp_path), loader_parity="numpy", plot=False,
    )
    perf = train_model(cfg, ds)
    assert np.isfinite(perf["train_loss"]).all()
    import glob
    import os

    from pcgmix_tpu.exp import experiment_dir

    csvs = glob.glob(os.path.join(experiment_dir(cfg), "classical_space", "*.csv"))
    assert csvs


def test_2d_training_durratiomixup():
    ds = synthetic_spectrogram_dict(num_wavs_train=16, num_wavs_test=6, size=64)
    cfg = TrainConfig(
        dataset="PhysioNet(spec128)", model="resnet9", method="durratiomixup",
        num_epochs=1, batch_size=8, save_artifacts=False, loader_parity="numpy",
    )
    perf = train_model(cfg, ds)
    assert np.isfinite(perf["train_loss"]).all()


@pytest.mark.parametrize(
    "method", ["durmixfreqmask", "durmixtimemask", "durmixcutout", "freqmask(0.2)",
               "cutmix", "durratiocutmix"]
)
def test_2d_methods(method):
    ds = synthetic_spectrogram_dict(num_wavs_train=12, num_wavs_test=4, size=32)
    cfg = TrainConfig(
        dataset="PhysioNet(spec128)", model="resnet9", method=method,
        num_epochs=1, batch_size=8, save_artifacts=False, loader_parity="numpy",
    )
    perf = train_model(cfg, ds)
    assert np.isfinite(perf["train_loss"]).all()


def test_umc_training():
    ds = synthetic_umc_dict(segments_per_patient=2, sig_len=512)
    cfg = TrainConfig(
        dataset="UMC", model="resnet9-5k", method="(UMC-subset)durratiocutmix",
        num_epochs=1, batch_size=16, seed_data=1, save_artifacts=False,
        loader_parity="numpy",
    )
    perf = train_model(cfg, ds)
    assert np.isfinite(perf["train_loss"]).all()


def test_same_cvd_pairing_with_map():
    """(sameCVD) pairing via TrainConfig.cvd_map (the reference reads an
    out-of-repo cvds_map.csv, augmentations.py:26-28, :516-526)."""
    wavs = sorted(set(DS["train"]["wav"]))
    cvd_map = {w: ["CAD", "MVP", "Benign"][i % 3] for i, w in enumerate(wavs)}
    _run("(sameCVD)durratiomixup", cvd_map=cvd_map)


def test_same_cvd_without_map_raises():
    with pytest.raises(ValueError, match="cvd_map"):
        _run("(sameCVD)durratiomixup")
