"""Model-hook gang training: (salopt…) and (closestknn/bins) methods in one
vmapped program (gang.py hook_mode).

These methods plan through FROZEN checkpoints — per-member pretrained
baselines for salopt (saliency.py:26-37), the shared canonical ResCNN for
closest pairing (latent_space.py:27-29) — so each member's plans stay a pure
function of its batch: the gang gathers each member's device batch from the
shared base, runs its hook, and feeds the plan into the vmapped update
(per-step dispatch, no scan fusion).  SGD runs give the sharp parity check
(tests/test_gang.py discipline)."""

import copy
import os

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.exp import experiment_dir
from pcgmix_tpu.saliency import make_pretrained_saliency_fn
from pcgmix_tpu.train import TrainConfig, train_gang, train_model
from pcgmix_tpu.train.gang import gang_ineligible_reason, group_gangable
from pcgmix_tpu.train.loop import build_splits

DS = synthetic_physionet_dict(
    num_wavs_train=24, num_wavs_test=6, segments_per_wav=3, sig_len=512, seed=5
)


def _cfg(root, **kw):
    d = dict(
        dataset="PhysioNet", model="resnet9-5k", method="base", num_epochs=2,
        batch_size=16, sig_len=512, n_fraction=0.5, op="SGD",
        experiments_root=root, loader_parity="numpy", plot=False,
        save_artifacts=False,
    )
    d.update(kw)
    return TrainConfig(**d)


@pytest.fixture(scope="module")
def equal_seed_datas():
    """Two seed_data values with equal-sized train subsets (hook methods
    require the equal-size gang path)."""
    sizes: dict = {}
    for i in range(1, 13):
        tr, _ = build_splits(_cfg("/tmp", seed_data=1100000 + i), DS)
        sizes.setdefault(len(tr), []).append(1100000 + i)
    pairs = [v for v in sizes.values() if len(v) >= 2]
    assert pairs, "no equal-sized seed_data pair in probe range"
    return pairs[0][:2]


@pytest.fixture(scope="module")
def baselines(tmp_path_factory, equal_seed_datas):
    """Per-member pretrained baseline runs (the salopt dependency: same
    config, method='base', runner._salopt_dependency)."""
    root = str(tmp_path_factory.mktemp("hooks"))
    for sd in equal_seed_datas:
        train_model(_cfg(root, seed_data=sd, save_artifacts=True), DS)
    return root


def _tight(gang, singles, rtol=1e-3):
    for g, s in zip(gang, singles):
        np.testing.assert_allclose(g["train_loss"], s["train_loss"], rtol=rtol)
        np.testing.assert_allclose(g["test_loss"], s["test_loss"], rtol=rtol)
        assert g["steps"] == s["steps"]
        assert g["test_accuracy"] == s["test_accuracy"]
        # prediction-level: identical per-wav recording votes (VERDICT r3)
        assert g["test_wav_preds"] == s["test_wav_preds"]


def test_hook_methods_eligibility_flag():
    """salopt/closest are ineligible by default (no hooks) and eligible
    when the caller declares it will wire them."""
    for method in ("(saloptenv)durratiomixup", "(closestknn=2)durmixmagwarp(0.2,4)"):
        cfg = _cfg("/tmp", method=method)
        assert gang_ineligible_reason(cfg) is not None
        assert gang_ineligible_reason(cfg, model_hooks=True) is None


def test_salopt_gang_matches_singles(baselines, equal_seed_datas):
    """(saloptenv)durratiomixup gang: per-member providers close over each
    member's OWN baseline checkpoint; plans (and therefore trajectories)
    match the standalone runs."""
    root = baselines
    cfgs = [
        _cfg(root, seed_data=sd, method="(saloptenv)durratiomixup")
        for sd in equal_seed_datas
    ]

    def provider_for(cfg):
        def ckpt_dir_for(method, _cfg=cfg):
            dep = copy.deepcopy(_cfg)
            dep.method = method
            dep.save_artifacts = True
            return experiment_dir(dep)

        return make_pretrained_saliency_fn(cfg, ckpt_dir_for)

    providers = [provider_for(c) for c in cfgs]
    gang = train_gang(cfgs, DS, saliency_model_providers=providers)
    singles = [
        train_model(c, DS, saliency_model_provider=p)
        for c, p in zip(cfgs, providers)
    ]
    _tight(gang, singles)


def test_salopt_gang_requires_providers(baselines, equal_seed_datas):
    cfgs = [
        _cfg(baselines, seed_data=sd, method="(saloptenv)durratiomixup")
        for sd in equal_seed_datas
    ]
    with pytest.raises(ValueError, match="saliency provider per member"):
        train_gang(cfgs, DS)


def test_closest_pairing_gang_matches_singles(tmp_path, equal_seed_datas):
    """(closestknn=…) gang: the canonical frozen ResCNN is shared; both
    train_model and train_gang auto-resolve it from the run dir."""
    from pcgmix_tpu.latent import latent_pretrain_config

    root = str(tmp_path / "lat")
    cfgs = [
        _cfg(root, seed_data=sd, method="(closestknn=2)durmixmagwarp(0.2,4)")
        for sd in equal_seed_datas
    ]
    dep = latent_pretrain_config(cfgs[0])
    train_model(dep, DS)
    gang = train_gang(cfgs, DS)
    singles = [train_model(c, DS) for c in cfgs]
    _tight(gang, singles)


def test_salopt_gang_mesh_matches_single_device(baselines, equal_seed_datas):
    """Hook planning happens OUTSIDE the sharded program (per-member device
    batches, frozen checkpoints); the plans then feed the member-axis
    sharded update — numerically the same program as unsharded."""
    root = baselines
    cfgs = [
        _cfg(root, seed_data=sd, method="(saloptenv)durratiomixup")
        for sd in equal_seed_datas
    ]

    def provider_for(cfg):
        def ckpt_dir_for(method, _cfg=cfg):
            dep = copy.deepcopy(_cfg)
            dep.method = method
            dep.save_artifacts = True
            return experiment_dir(dep)

        return make_pretrained_saliency_fn(cfg, ckpt_dir_for)

    providers = [provider_for(c) for c in cfgs]
    plain = train_gang(cfgs, DS, saliency_model_providers=providers)
    meshed = train_gang(
        cfgs, DS, saliency_model_providers=providers, n_devices=2
    )
    _tight(meshed, plain)


def test_salopt_gang_checkpoint_resume_completes(baselines, equal_seed_datas,
                                                 tmp_path, monkeypatch):
    """Crash mid-salopt-gang → rerun resumes from the stacked checkpoint
    and COMPLETES.  Hook engines cannot replay their RNG mirrors without
    the frozen-model hooks, so post-resume plans restart the stream —
    train_model's documented resume semantics for model-hook methods
    (PARITY.md); the regression here is the crash, not bit parity."""
    from pcgmix_tpu.train.checkpoint import CheckpointManager

    root = str(tmp_path / "resume")

    def cfgs():
        return [
            _cfg(root, seed_data=sd, method="(saloptenv)durratiomixup",
                 num_epochs=3, checkpoint_every=1, save_artifacts=True)
            for sd in equal_seed_datas
        ]

    def providers():
        out = []
        for cfg in cfgs():
            def ckpt_dir_for(method, _cfg=cfg):
                dep = copy.deepcopy(_cfg)
                dep.method = method
                dep.save_artifacts = True
                dep.num_epochs = 2  # the baselines fixture's config
                dep.checkpoint_every = 0
                dep.experiments_root = baselines
                return experiment_dir(dep)

            out.append(make_pretrained_saliency_fn(cfg, ckpt_dir_for))
        return out

    calls = {"n": 0}
    orig_save = CheckpointManager.save

    def crashing_save(self, step, state, metrics=None):
        orig_save(self, step, state, metrics)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(CheckpointManager, "save", crashing_save)
    with pytest.raises(RuntimeError, match="simulated crash"):
        train_gang(cfgs(), DS, saliency_model_providers=providers())
    monkeypatch.setattr(CheckpointManager, "save", orig_save)

    resumed = train_gang(cfgs(), DS, saliency_model_providers=providers())
    for r in resumed:
        assert np.isfinite(r["train_loss"]).all()
        assert r["epochs"][-1] == 3
        assert os.path.exists(
            os.path.join(experiment_dir(cfgs()[0]), "model.msgpack")
        )


def test_runner_gangs_salopt_with_dependency_gang(tmp_path, capsys,
                                                  equal_seed_datas):
    """run_grid --gang on a salopt grid: the missing per-member baseline
    pretrains train as their OWN gang first, then the salopt gang runs with
    wired providers; every run dir lands."""
    from pcgmix_tpu.exp.runner import run_grid

    root = str(tmp_path / "grid")
    base_cfg = _cfg(root, save_artifacts=True)
    ran = run_grid(
        base_cfg, DS, ["(saloptenv)durratiomixup"], [0.5], [1],
        seed_datas=equal_seed_datas, robust=False, gang=True, progress=True,
    )
    out = capsys.readouterr().out
    assert "gang of 2 (dependency): base" in out
    assert "gang of 2: (saloptenv)durratiomixup" in out
    assert len(ran) == 4  # 2 dependency members + 2 salopt members
    for cfg in ran:
        assert os.path.exists(
            os.path.join(experiment_dir(cfg), "performance.pkl")
        )


def test_closest_paired_latent_gang_matches_singles(tmp_path, equal_seed_datas):
    """(closestknn=2)latentmixup — latent split-forward AND closest pairing
    combined: the latent-mode plan call must carry the frozen-embedding
    hook kwargs (the pairing evaluates latent_fn), exactly like
    train_model's plan call (loop.py).  Regression for the gang latent
    branch planning without hooks."""
    from pcgmix_tpu.latent import latent_pretrain_config

    root = str(tmp_path / "latmix")
    cfgs = [
        _cfg(root, seed_data=sd, method="(closestknn=2)latentmixup")
        for sd in equal_seed_datas
    ]
    dep = latent_pretrain_config(cfgs[0])
    train_model(dep, DS)
    gang = train_gang(cfgs, DS)
    singles = [train_model(c, DS) for c in cfgs]
    _tight(gang, singles)
