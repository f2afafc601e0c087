"""2-D extras: UMC spectrogram splits/training and 2-D salopt flow."""

import copy
import os

import numpy as np
import pytest

from pcgmix_tpu.data.synthetic import synthetic_spectrogram_dict
from pcgmix_tpu.data.umc import ALL_PATIENTS, HELDOUT_GROUPS
from pcgmix_tpu.data import umc_split
from pcgmix_tpu.train import TrainConfig, train_model


def _umc_spec_dict(size=32):
    base = synthetic_spectrogram_dict(
        num_wavs_train=len(ALL_PATIENTS), num_wavs_test=0,
        segments_per_wav=2, size=size,
    )["train"]
    n = len(base["label"])
    base["id"] = np.array(
        [ALL_PATIENTS[i % len(ALL_PATIENTS)] for i in range(n)], object
    )
    base["excluded"] = np.ones(n, np.int64)
    return base


def test_umc_spec_split_and_training():
    d = _umc_spec_dict()
    tr = umc_split(d, "train", seed_data=2, spectrogram=True)
    te = umc_split(d, "test", seed_data=2, spectrogram=True)
    assert tr.data.ndim == 4 and tr.data.shape[1] == 1
    assert set(te.ids) == set(HELDOUT_GROUPS[1])
    cfg = TrainConfig(
        dataset="UMC(spec64)", model="resnet9", method="durratiocutmix",
        num_epochs=1, batch_size=8, seed_data=2, save_artifacts=False,
        loader_parity="numpy",
    )
    perf = train_model(cfg, d)
    assert np.isfinite(perf["train_loss"]).all()


def test_2d_salopt_flow(tmp_path):
    """(saloptenv)durratiomixup on spectrograms against a pretrained 2-D
    baseline (saliency dim=2 path, saliency.py:92-115)."""
    from pcgmix_tpu.exp import experiment_dir
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.saliency import saliency_maps
    from pcgmix_tpu.train.loop import load_checkpoint

    ds = synthetic_spectrogram_dict(num_wavs_train=12, num_wavs_test=4, size=32)
    base_cfg = TrainConfig(
        dataset="PhysioNet(spec128)", model="resnet9", method="base",
        num_epochs=1, batch_size=8, experiments_root=str(tmp_path),
        loader_parity="numpy", plot=False,
    )
    train_model(base_cfg, ds)
    ckpt = os.path.join(experiment_dir(base_cfg), "model.msgpack")

    model = build_model("resnet9", dataset="PhysioNet(spec128)", train=False)
    restored = load_checkpoint(ckpt, model, (1, 1, 32, 32))

    def provider(salopt_model: int):
        def fn(data, target_ohe, frames):
            return saliency_maps(
                model, restored["params"], restored["batch_stats"], data,
                target_ohe, frames, dim=2,
            )
        return fn

    cfg = copy.deepcopy(base_cfg)
    cfg.method = "(saloptenv)durratiomixup"
    cfg.save_artifacts = False
    perf = train_model(cfg, ds, saliency_model_provider=provider)
    assert np.isfinite(perf["train_loss"]).all()


def test_2d_latentmixup_training():
    """2-D latentmixup: random-depth split forward on ResNet9-2D
    (augmentations2d.py:510-537; depth ~ randint(1,3) for resnet9)."""
    ds = synthetic_spectrogram_dict(num_wavs_train=12, num_wavs_test=4, size=32)
    cfg = TrainConfig(
        dataset="PhysioNet(spec128)", model="resnet9", method="latentmixup",
        num_epochs=2, batch_size=8, save_artifacts=False,
        loader_parity="numpy",
    )
    perf = train_model(cfg, ds)
    assert np.isfinite(perf["train_loss"]).all()
