"""Saliency-guided augmentation + latent-pairing end-to-end flows."""

import copy
import os

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.exp import experiment_dir
from pcgmix_tpu.saliency import make_pretrained_saliency_fn, saliency_maps
from pcgmix_tpu.train import TrainConfig, train_model

DS = synthetic_physionet_dict(
    num_wavs_train=20, num_wavs_test=6, segments_per_wav=3, sig_len=512, seed=5
)


@pytest.fixture(scope="module")
def baseline_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sal"))
    cfg = TrainConfig(
        dataset="PhysioNet", model="resnet9-5k", method="base", num_epochs=2,
        batch_size=16, sig_len=512, experiments_root=root,
        loader_parity="numpy", plot=False,
    )
    train_model(cfg, DS)
    return cfg, root


def test_salopt_durratiomixup(baseline_run):
    base_cfg, root = baseline_run
    cfg = copy.deepcopy(base_cfg)
    cfg.method = "(saloptenv)durratiomixup"
    cfg.save_artifacts = False

    def ckpt_dir_for(method):
        resolved = copy.deepcopy(base_cfg)
        resolved.method = method
        return experiment_dir(resolved)

    provider = make_pretrained_saliency_fn(cfg, ckpt_dir_for)
    perf = train_model(cfg, DS, saliency_model_provider=provider)
    assert np.isfinite(perf["train_loss"]).all()

    cfg.method = "(saloptsum)durratiomixup"
    perf = train_model(cfg, DS, saliency_model_provider=provider)
    assert np.isfinite(perf["train_loss"]).all()


def test_salopt_requires_provider():
    cfg = TrainConfig(
        dataset="PhysioNet", model="resnet9-5k",
        method="(saloptenv)durratiomixup", num_epochs=1, batch_size=16,
        sig_len=512, save_artifacts=False, loader_parity="numpy",
    )
    with pytest.raises(ValueError, match="saliency"):
        train_model(cfg, DS)


def test_saliency_maps_properties(baseline_run):
    base_cfg, root = baseline_run
    from pcgmix_tpu.data import physionet_split
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.loop import load_checkpoint

    split = physionet_split(DS, "train")
    model = build_model("resnet9-5k", train=False)
    restored = load_checkpoint(
        os.path.join(experiment_dir(base_cfg), "model.msgpack"),
        model, (1, 4, 512),
    )
    data = split.data[:8]
    target = np.eye(2, dtype=np.float32)[split.label[:8]]
    sal = saliency_maps(
        model, restored["params"], restored["batch_stats"], data, target,
        split.frames[:8],
    )
    assert sal.shape == (8, 512)
    assert np.all(sal >= 0) and np.all(sal <= 1 + 1e-6)
    for i in range(8):
        assert np.all(sal[i, split.frames[i, -1] :] == 0)  # zero tails
        assert sal[i].max() == pytest.approx(1.0, abs=1e-5)  # normalized


def test_closest_pairing_flows(baseline_run):
    """closestknn / closestbins use frozen-latent TSP pairing."""
    base_cfg, root = baseline_run
    from pcgmix_tpu.latent import LatentSpace

    lat = LatentSpace(
        os.path.join(experiment_dir(base_cfg), "model.msgpack"),
        model_name="resnet9-5k", sig_len=512,
    )
    for method in ["(closestknn=3)durratiomixup", "(closestbins=4)durratiomixup"]:
        cfg = copy.deepcopy(base_cfg)
        cfg.method = method
        cfg.num_epochs = 1
        cfg.save_artifacts = False
        perf = train_model(cfg, DS, latent_feature_fn=lambda d: lat.generate(d))
        assert np.isfinite(perf["train_loss"]).all(), method


def test_salopt_variant_model_resolution(baseline_run):
    """(saloptenv-1) resolves the saliency model from the durratiomixup run
    (saliency.py:28-33): train that run first, then consume its checkpoint."""
    base_cfg, root = baseline_run
    mix_cfg = copy.deepcopy(base_cfg)
    mix_cfg.method = "durratiomixup"
    train_model(mix_cfg, DS)

    cfg = copy.deepcopy(base_cfg)
    cfg.method = "(saloptenv-1)durratiomixup"
    cfg.save_artifacts = False

    resolved = []

    def ckpt_dir_for(method):
        resolved.append(method)
        c = copy.deepcopy(base_cfg)
        c.method = method
        return experiment_dir(c)

    provider = make_pretrained_saliency_fn(cfg, ckpt_dir_for)
    perf = train_model(cfg, DS, saliency_model_provider=provider)
    assert np.isfinite(perf["train_loss"]).all()
    assert resolved == ["durratiomixup"]  # the -1 variant, not 'base'
