"""Latent subsystem, plotters, results reader, variability counter tests."""

import os

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.train import TrainConfig, train_model
from pcgmix_tpu.train.counters import VariabilityCounter


def test_variability_counter_semantics():
    vc = VariabilityCounter(base_original=10)
    vc.add(np.array([1, 2, 3]), None, None, step=0)
    assert vc.lens_base[-1] == 3 and vc.lens_pairs[-1] == 0
    vc.add(np.array([1, 2, 3]), np.array([1, 0, 2]), 2, step=1)
    # (1,2) pair from (1↔2), (2,1) same unordered pair, 3 mixed with itself
    assert vc.lens_base[-1] == 3  # self-mixed 3 dedups into the base set
    assert vc.lens_pairs[-1] == 1
    assert vc.lens_unique[-1] == 2  # ordered (1,2,2) and (2,1,2)


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("runs")
    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=8, segments_per_wav=3, sig_len=512, seed=7
    )
    cfg = TrainConfig(
        model="resnet9-5k", method="durratiomixup", num_epochs=2, batch_size=16,
        sig_len=512, experiments_root=str(root), loader_parity="numpy",
        track_variability=True,
    )
    train_model(cfg, ds)
    return cfg, ds, root


def test_plots_written(trained_run):
    cfg, ds, root = trained_run
    from pcgmix_tpu.exp import experiment_dir

    d = experiment_dir(cfg)
    for f in ("accuracy.jpg", "loss.jpg", "learning_rate.jpg", "times.jpg",
              "variability.jpg", "variability.pkl"):
        assert os.path.exists(os.path.join(d, f)), f


def test_results_reader(trained_run):
    cfg, ds, root = trained_run
    import copy

    from pcgmix_tpu.exp.results import read_experiments_all_dataseeds

    # register this run under the 1.0 grid's seed_data/seed so the reader
    # finds it (cfg already has seed_data=1100001, seed=1; method has no +cp
    # because num_epochs was overridden — use the raw method template)
    template = copy.deepcopy(cfg)
    template.method = "durratiomixup"
    res = read_experiments_all_dataseeds(template, [1.0], metric="Accuracy")
    # hyperparameters_robust rewrites epochs to 50 → run dir won't match;
    # non-robust models pass through:
    template.model = "resnet9-5k"
    res = read_experiments_all_dataseeds(template, [1.0], metric="Accuracy")
    assert res.n_fractions == [1.0]
    assert res.num_runs == [1]
    assert 0 <= res.mean[0] <= 100


def test_latent_space_model_roundtrip(trained_run, tmp_path):
    cfg, ds, root = trained_run
    from pcgmix_tpu.exp import experiment_dir
    from pcgmix_tpu.latent import LatentSpace, plot_latent_space

    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    lat = LatentSpace(ckpt, model_name="resnet9-5k", sig_len=512)
    data = ds["train"]
    from pcgmix_tpu.data import physionet_split

    split = physionet_split(ds, "train")
    fts = lat.generate(split.data[:12])
    assert fts.ndim == 2 and fts.shape[0] == 12
    path = plot_latent_space(
        {"fts": fts, "trgts": split.label[:12], "fts_new": fts,
         "trgts_new": split.label[:12]},
        "train", 1, 2, "durratiomixup", str(tmp_path), dim_reduc="pca",
    )
    assert os.path.exists(path)


def test_plot_latent_space_accepts_training_dump_keys(trained_run, tmp_path):
    """The training loop dumps {'fts', 'target'} (loop.py:579); the plotter
    must accept that dict as-is, and for method='base' (no augmented
    points) embed the originals alone instead of a duplicated copy
    (regression: KeyError 'trgts'; duplicate points distorting t-SNE)."""
    cfg, ds, root = trained_run
    from pcgmix_tpu.exp import experiment_dir
    from pcgmix_tpu.latent import LatentSpace, plot_latent_space

    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    lat = LatentSpace(ckpt, model_name="resnet9-5k", sig_len=512)
    from pcgmix_tpu.data import physionet_split

    split = physionet_split(ds, "train")
    fts = lat.generate(split.data[:12])
    path = plot_latent_space(
        {"fts": fts, "target": split.label[:12]},
        "train", 1, 2, "base", str(tmp_path), dim_reduc="tsne",
    )
    assert os.path.exists(path)


def test_plot_latent_space_test_variant(trained_run, tmp_path):
    """latent_space.py:197-240: test-only cloud, no augmented points."""
    cfg, ds, root = trained_run
    from pcgmix_tpu.exp import experiment_dir
    from pcgmix_tpu.latent import LatentSpace, plot_latent_space_test

    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    lat = LatentSpace(ckpt, model_name="resnet9-5k", sig_len=512)
    from pcgmix_tpu.data import physionet_split

    split = physionet_split(ds, "test")
    fts = lat.generate(split.data[:16])
    path = plot_latent_space_test(
        {"fts": fts, "target": split.label[:16]},
        "test", 2, 2, "durratiomixup", str(tmp_path), dim_reduc="pca",
    )
    assert os.path.exists(path)


def test_plot_latent_space_test_train_variant(trained_run, tmp_path):
    """latent_space.py:242-311: joint test/train reduction, two pngs."""
    cfg, ds, root = trained_run
    from pcgmix_tpu.exp import experiment_dir
    from pcgmix_tpu.latent import LatentSpace, plot_latent_space_test_train

    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    lat = LatentSpace(ckpt, model_name="resnet9-5k", sig_len=512)
    from pcgmix_tpu.data import physionet_split

    tr = physionet_split(ds, "train")
    te = physionet_split(ds, "test")
    p_test, p_train = plot_latent_space_test_train(
        {"fts": lat.generate(te.data[:16]), "target": te.label[:16]},
        {"fts_new": lat.generate(tr.data[:16]), "trgts_new": tr.label[:16]},
        "final", 2, 2, "durratiomixup", str(tmp_path), dim_reduc="pca",
    )
    assert os.path.exists(p_test) and os.path.exists(p_train)
    assert "(test)" in p_test and "(train)" in p_train


def test_get_hidden_features(trained_run):
    """latent_space.py:66-90: whole-split feature/confidence dump."""
    cfg, ds, root = trained_run
    from pcgmix_tpu.exp import experiment_dir
    from pcgmix_tpu.latent import LatentSpace, get_hidden_features

    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    lat = LatentSpace(ckpt, model_name="resnet9-5k", sig_len=512)
    from pcgmix_tpu.data import physionet_split

    split = physionet_split(ds, "test")
    fts, trgts, confs, indcs = get_hidden_features(
        lat.model, lat.variables, split, batch_size=8
    )
    n = len(split.data)
    assert fts.shape[0] == n and fts.ndim == 2
    assert confs.shape == (n, 2)
    assert trgts == list(split.label)
    assert indcs == list(range(n))


def test_plot_m1_trajectory(tmp_path):
    """plotters.py:189-207: M1 trajectory plot with max marker."""
    from pcgmix_tpu.exp.plotters import plot_m1

    path = plot_m1([0.1, 0.5, 0.3, 0.2], str(tmp_path))
    assert os.path.exists(path) and path.endswith("m1.jpg")
