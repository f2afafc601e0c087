"""Grid runner, orbax resume, and viz tests."""

import os

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.exp import experiment_dir
from pcgmix_tpu.exp.runner import run_grid
from pcgmix_tpu.train import TrainConfig, train_model

DS = synthetic_physionet_dict(
    num_wavs_train=16, num_wavs_test=4, segments_per_wav=2, sig_len=512, seed=9
)


def _base(root):
    return TrainConfig(
        dataset="PhysioNet", model="resnet9-5k", num_epochs=1, batch_size=8,
        sig_len=512, experiments_root=str(root), loader_parity="numpy",
        plot=False,
    )


def test_run_grid_and_resume_skip(tmp_path):
    cfg = _base(tmp_path)
    ran = run_grid(cfg, DS, ["base"], [1.0], [1], seed_datas=[1100001],
                   robust=False, progress=False)
    assert len(ran) == 1
    assert os.path.exists(os.path.join(experiment_dir(ran[0]), "model.msgpack"))
    # rerun skips the finished config (utils.experiment_already_done behavior)
    ran2 = run_grid(cfg, DS, ["base"], [1.0], [1], seed_datas=[1100001],
                    robust=False, progress=False)
    assert ran2 == []


def test_latent_dependency_dag(tmp_path):
    """(closestknn…) methods depend on the canonical frozen ResCNN run
    (latent_space.py:27-29; experiments_timeseries.ipynb cell 13 trains it
    first): the runner trains it when absent and train_model auto-loads
    it; without it, train_model fails with a pointer."""
    import copy

    cfg = _base(tmp_path)
    method = "(closestknn=2)durmixmagwarp(0.2,4)"
    solo = copy.deepcopy(cfg)
    solo.method = method
    with pytest.raises(FileNotFoundError, match="latent-space model"):
        train_model(solo, DS)

    ran = run_grid(cfg, DS, [method], [1.0], [1], seed_datas=[1100001],
                   robust=False, progress=False)
    assert len(ran) == 2  # the ResCNN dependency, then the method run
    dep, run = ran
    assert dep.model == "ResCNN" and dep.method == "base"
    assert dep.num_epochs == 10 and dep.batch_size == 32  # reference config
    assert os.path.exists(os.path.join(experiment_dir(dep), "model.msgpack"))
    assert os.path.exists(os.path.join(experiment_dir(run), "model.msgpack"))
    # rerun: dependency and method run both resume-skip
    ran2 = run_grid(cfg, DS, [method], [1.0], [1], seed_datas=[1100001],
                    robust=False, progress=False)
    assert ran2 == []


def test_latent_pretrain_config_is_canonical(tmp_path):
    """latent_pretrain_config builds the dependency FRESH: run-variant
    fields not encoded in the run-dir name (torch_init, true_seed,
    classical_space, ...) must not leak into the canonical frozen run."""
    from pcgmix_tpu.latent import latent_pretrain_config

    cfg = _base(tmp_path)
    cfg.torch_init = True
    cfg.true_seed = 21
    cfg.classical_space = True
    cfg.latent_space = True
    dep = latent_pretrain_config(cfg)
    assert dep.model == "ResCNN" and dep.method == "base"
    assert not dep.torch_init and dep.true_seed is None
    assert not dep.classical_space and not dep.latent_space
    assert dep.experiments_root == cfg.experiments_root  # env inherited
    assert dep.sig_len == cfg.sig_len


def test_salopt_dependency_2d():
    """_salopt_dependency must parse with the 2-D ladder for spectrogram
    configs, or 2-D salopt methods lose their DAG edge."""
    from pcgmix_tpu.exp.runner import _salopt_dependency

    cfg = TrainConfig(
        dataset="PhysioNet(spec128)", model="resnet9", num_channels=1,
        method="(saloptsum)durratiomixup",
    )
    dep = _salopt_dependency(cfg, robust=False)
    assert dep is not None and dep.method == "base"


def test_salopt_2d_runner_e2e(tmp_path):
    """The full 2-D salopt DAG through run_grid: the base dependency trains
    first, then the (saloptenv) run restores it at the dataset's true 2-D
    input shape (cfg.sig_len is the 1-D cycle length, not the mel size) and
    trains end-to-end."""
    from pcgmix_tpu.data.synthetic import synthetic_spectrogram_dict

    ds = synthetic_spectrogram_dict(num_wavs_train=12, num_wavs_test=4, size=32)
    cfg = TrainConfig(
        dataset="PhysioNet(spec128)", model="resnet9", num_epochs=1,
        batch_size=8, experiments_root=str(tmp_path), loader_parity="numpy",
        plot=False,
    )
    ran = run_grid(cfg, ds, ["(saloptenv)durratiomixup"], [1.0], [1],
                   seed_datas=[1100001], robust=False, progress=False)
    assert len(ran) == 2  # base dependency + the salopt run
    assert ran[0].method == "base"
    for r in ran:
        assert os.path.exists(os.path.join(experiment_dir(r), "model.msgpack"))


def test_checkpoint_resume(tmp_path):
    from pcgmix_tpu.train.checkpoint import CheckpointManager

    cfg = _base(tmp_path)
    cfg.num_epochs = 2
    cfg.checkpoint_every = 1
    perf1 = train_model(cfg, DS)
    assert len(perf1["train_loss"]) >= 1
    ckdir = os.path.join(experiment_dir(cfg), "checkpoints")
    assert os.path.isdir(ckdir)
    mgr = CheckpointManager(ckdir)
    steps_before = mgr.latest_step()
    mgr.close()
    assert steps_before and steps_before > 0
    # a rerun of the SAME config restores the final checkpoint and has no
    # remaining epochs to train — it must not repeat any work, and the
    # restored metric history keeps the full pre-resume training curve
    perf2 = train_model(cfg, DS, progress=False)
    assert perf2["train_loss"] == perf1["train_loss"]
    assert perf2["epochs"] == perf1["epochs"]
    mgr = CheckpointManager(ckdir)
    assert mgr.latest_step() == steps_before
    mgr.close()


def test_checkpoint_resume_replays_engine_rng(tmp_path, monkeypatch):
    """Mid-training resume with a stream-consuming augmentation
    (magnitudewarp draws spline knots from the engine's per-run mirror
    stream that ADVANCES across steps): the resumed run must rebuild
    post-resume plans exactly as the uninterrupted run — replay_plan_rng
    fast-forwards the fresh engine's RNG state on restore."""
    import copy

    from pcgmix_tpu.train.checkpoint import CheckpointManager

    def mk(root):
        cfg = _base(root)
        cfg.method = "magnitudewarp(0.2,4)"
        cfg.num_epochs = 3
        cfg.checkpoint_every = 1
        return cfg

    ref = train_model(mk(tmp_path / "ref"), DS)

    calls = {"n": 0}
    orig_save = CheckpointManager.save

    def crashing_save(self, step, state, metrics=None):
        orig_save(self, step, state, metrics)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(CheckpointManager, "save", crashing_save)
    with pytest.raises(RuntimeError, match="simulated crash"):
        train_model(mk(tmp_path / "run"), DS)
    monkeypatch.setattr(CheckpointManager, "save", orig_save)

    resumed = train_model(mk(tmp_path / "run"), DS)
    np.testing.assert_allclose(resumed["train_loss"], ref["train_loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(resumed["test_loss"], ref["test_loss"],
                               rtol=1e-6)
    assert resumed["epochs"] == ref["epochs"]


def test_viz_helpers(tmp_path):
    from pcgmix_tpu.exp.viz import show_sal, show_sig, show_spectrogram

    sig = np.random.default_rng(0).normal(size=(4, 400))
    p1 = show_sig(sig, frames=[0, 50, 150, 200, 380], cuts=[150],
                  path=str(tmp_path / "sig.png"))
    p2 = show_spectrogram(np.random.default_rng(1).normal(size=(64, 64)),
                          frames=[5, 20, 30, 60], path=str(tmp_path / "spec.png"))
    p3 = show_sal(np.random.default_rng(2).random(400),
                  path=str(tmp_path / "sal.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p)

def test_runner_cli_fast_config_flags(tmp_path):
    """The CLI exposes the production perf knobs (compute dtype, scan
    dispatch, mesh devices) and threads them into TrainConfig."""
    from pcgmix_tpu import utils
    from pcgmix_tpu.exp.runner import main

    dat = tmp_path / "p.dat"
    utils.dict2file(DS, str(dat))
    main([
        "--dataset-file", str(dat), "--methods", "durmixmagwarp(0.2,4)",
        "--n-fractions", "1.0", "--seeds", "1", "--seed-datas", "1100001",
        "--model", "resnet9-5k", "--num-epochs", "1", "--batch-size", "8",
        "--no-robust", "--experiments-root", str(tmp_path / "exp"),
        "--compute-dtype", "bfloat16", "--steps-per-dispatch", "2",
        "--n-devices", "2", "--eval-batch-size", "16",
    ])
    import glob

    runs = glob.glob(str(tmp_path / "exp" / "*"))
    assert len(runs) == 1 and os.path.exists(
        os.path.join(runs[0], "model.msgpack")
    )


def test_checkpoint_resume_under_dp_mesh(tmp_path):
    """Orbax full-state checkpointing and resume with the data-parallel
    mesh active (replicated state must save and restore cleanly)."""
    cfg = _base(tmp_path)
    cfg.num_epochs = 2
    cfg.checkpoint_every = 1
    cfg.n_devices = 2
    cfg.method = "durratiomixup"
    perf1 = train_model(cfg, DS)
    assert np.isfinite(perf1["train_loss"]).all()
    ckdir = os.path.join(experiment_dir(cfg), "checkpoints")
    assert os.path.isdir(ckdir)
    perf2 = train_model(cfg, DS, progress=False)
    # resumed past the last epoch: no retraining, history restored
    assert perf2["train_loss"] == perf1["train_loss"]


def test_results_cli_reads_grid(tmp_path, capsys):
    """pcgmix-results aggregates finished runner dirs into the paper-style
    mean±SD grid table (results_final_full.ipynb cells 4/17 flow)."""
    from pcgmix_tpu import utils
    from pcgmix_tpu.exp.results import main as res_main
    from pcgmix_tpu.exp.runner import main as run_main

    dat = tmp_path / "p.dat"
    utils.dict2file(DS, str(dat))
    run_main([
        "--dataset-file", str(dat), "--methods", "base", "--n-fractions",
        "1.0", "--seeds", "1", "2", "--model", "resnet9-5k", "--num-epochs",
        "1", "--batch-size", "8", "--experiments-root", str(tmp_path / "exp"),
    ])
    res_main([
        "--experiments-root", str(tmp_path / "exp"), "--model", "resnet9-5k",
        "--methods", "base", "--n-fractions", "1.0", "--num-epochs", "1",
        "--batch-size", "8",
    ])
    out = capsys.readouterr().out
    assert "base" in out and "±" in out and "1.0" in out


def test_results_cli_nonpublished_nfrac_and_no_robust(tmp_path, capsys):
    """Custom n_fractions (outside the published seed_data grids) and
    --no-robust runs must aggregate instead of raising / reading nothing."""
    from pcgmix_tpu import utils
    from pcgmix_tpu.exp.results import main as res_main
    from pcgmix_tpu.exp.runner import main as run_main

    dat = tmp_path / "p.dat"
    utils.dict2file(DS, str(dat))
    run_main([
        "--dataset-file", str(dat), "--methods", "durratiomixup",
        "--n-fractions", "0.5", "--seeds", "1", "--model", "resnet9-5k",
        "--num-epochs", "1", "--batch-size", "8", "--no-robust",
        "--experiments-root", str(tmp_path / "exp"),
    ])
    res_main([
        "--experiments-root", str(tmp_path / "exp"), "--model", "resnet9-5k",
        "--methods", "durratiomixup", "--n-fractions", "0.5",
        "--num-epochs", "1", "--batch-size", "8", "--no-robust",
    ])
    out = capsys.readouterr().out
    assert "±" in out and "—" not in out.split("\n")[1]


def test_results_cli_paper_mode(tmp_path, capsys):
    """--paper emits the melted published table (acc ± sd plus relative
    improvement over the first method; results_final_full.ipynb cells
    4/17) with per-method display labels."""
    from pcgmix_tpu import utils
    from pcgmix_tpu.exp.results import main as res_main
    from pcgmix_tpu.exp.runner import main as run_main

    dat = tmp_path / "p.dat"
    utils.dict2file(DS, str(dat))
    run_main([
        "--dataset-file", str(dat), "--methods", "base", "durratiomixup",
        "--n-fractions", "1.0", "--seeds", "1", "2", "--model", "resnet9-5k",
        "--num-epochs", "1", "--batch-size", "8", "--no-robust",
        "--experiments-root", str(tmp_path / "exp"),
    ])
    res_main([
        "--experiments-root", str(tmp_path / "exp"), "--model", "resnet9-5k",
        "--methods", "base", "durratiomixup", "--n-fractions", "1.0",
        "--num-epochs", "1", "--batch-size", "8", "--no-robust", "--paper",
        "--method-labels", "Vanilla", "PCGmix",
    ])
    out = capsys.readouterr().out
    assert "resnet9-5k acc" in out and "resnet9-5k ri" in out
    van = next(l for l in out.splitlines() if "Vanilla (no aug.)" in l)
    pcg = next(l for l in out.splitlines() if "PCGmix (ours)" in l)
    # vanilla row: acc filled, ri blank ('-'); method row: acc AND ri filled
    assert van.count("±") == 1 and van.rstrip().endswith("-")
    assert pcg.count("±") == 2


def test_run_grid_salopt_dag(tmp_path):
    """(salopt…) grid points train their pretrained dependency first and
    wire the saliency provider automatically (SURVEY.md §7 hard parts:
    'the experiment runner must encode this DAG')."""
    cfg = _base(tmp_path)
    ran = run_grid(
        cfg, DS, ["(saloptenv)durratiomixup"], [1.0], [1],
        seed_datas=[1100001], robust=False, progress=False,
    )
    # the base dependency ran first, then the salopt run itself
    assert [c.method for c in ran] == ["base", "(saloptenv)durratiomixup"]
    assert os.path.exists(os.path.join(experiment_dir(ran[0]), "model.msgpack"))
    # rerunning skips both (dependency satisfied, run finished)
    ran2 = run_grid(
        cfg, DS, ["(saloptenv)durratiomixup"], [1.0], [1],
        seed_datas=[1100001], robust=False, progress=False,
    )
    assert ran2 == []
