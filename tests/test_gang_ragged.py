"""Ragged gang training — members with UNEQUAL train-split sizes and
PER-MEMBER test splits in one vmapped program (gang._train_gang_ragged).

The UMC 10-fold case is the native fixture: held-out patient groups have
3 or 4 patients (data/umc.py HELDOUT_GROUPS), so every fold gives a
different train size AND a different test set.  Parity discipline follows
tests/test_gang.py: SGD runs are the sharp semantic check (tight rtol —
any masking/schedule/RNG bug shows up orders of magnitude above float
reassociation); Adam runs use loose tolerances plus the discriminative
nearest-own-trajectory check (Adam chaotically amplifies vmap rounding).
"""

import os

import numpy as np
import pytest

from pcgmix_tpu.data.synthetic import synthetic_physionet_dict, synthetic_umc_dict
from pcgmix_tpu.train import TrainConfig, train_gang, train_model
from pcgmix_tpu.train.gang import _train_gang_ragged
from pcgmix_tpu.train.loop import build_splits

from .test_gang import _assert_member_parity


@pytest.fixture(scope="module")
def umc_dataset():
    return synthetic_umc_dict(segments_per_patient=3, sig_len=256, seed=3)


def _umc_cfg(sd, **kw):
    d = dict(
        dataset="UMC", model="resnet9-5k", method="durratiomixup",
        num_epochs=2, batch_size=8, sig_len=256, seed_data=sd,
        save_artifacts=False, loader_parity="numpy",
    )
    d.update(kw)
    return TrainConfig(**d)


def _tight(gang, singles, rtol=1e-3, atol=0.0):
    for g, s in zip(gang, singles):
        np.testing.assert_allclose(
            g["train_loss"], s["train_loss"], rtol=rtol, atol=atol
        )
        np.testing.assert_allclose(
            g["test_loss"], s["test_loss"], rtol=rtol, atol=atol
        )
        assert g["steps"] == s["steps"]
        assert g["epochs"] == s["epochs"]
        assert g["test_accuracy"] == s["test_accuracy"]


def test_runtime_optimizer_matches_baked_trajectories():
    """make_runtime_optimizer with host-injected table values reproduces the
    count-baked schedule chain bit-exactly (adam/SGD, scheduled and not —
    the unscheduled-adam case uses the baked chain in ragged mode, so only
    the combinations the ragged path actually dispatches are pinned)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pcgmix_tpu.train.schedule import onecycle_beta1, onecycle_lr
    from pcgmix_tpu.train.steps import make_optimizer, make_runtime_optimizer

    for op, use_sched in (("adam", True), ("SGD", True), ("SGD", False)):
        num = 17
        baked = make_optimizer(op, 0.01, 1e-4, 0.1, num, use_sched)
        rt, with_sched = make_runtime_optimizer(op, 0.01, 1e-4, 0.1)
        if use_sched:
            lr_t = np.asarray(jax.vmap(onecycle_lr(num, 0.01))(jnp.arange(num)))
            mom_t = np.asarray(jax.vmap(onecycle_beta1(num))(jnp.arange(num)))
        else:
            lr_t = np.full(num, 0.01, np.float32)
            mom_t = np.zeros(num, np.float32)
        p1 = {"w": jnp.ones(5)}
        p2 = {"w": jnp.ones(5)}
        s1, s2 = baked.init(p1), rt.init(p2)
        rng = np.random.default_rng(0)
        for t in range(num):
            g = {"w": jnp.asarray(rng.standard_normal(5), jnp.float32)}
            u1, s1 = baked.update(g, s1, p1)
            p1 = optax.apply_updates(p1, u1)
            u2, s2 = rt.update(g, with_sched(s2, lr_t[t], mom_t[t]), p2)
            p2 = optax.apply_updates(p2, u2)
        np.testing.assert_array_equal(
            np.asarray(p1["w"]), np.asarray(p2["w"]),
            err_msg=f"{op} use_sched={use_sched}",
        )


def test_umc_folds_are_actually_ragged(umc_dataset):
    """Fixture sanity: seed_data 1 vs 2 differ in train size AND test set."""
    (tr1, te1), (tr2, te2) = (
        build_splits(_umc_cfg(sd), umc_dataset) for sd in (1, 2)
    )
    assert len(tr1) != len(tr2)
    assert set(te1.wav) != set(te2.wav)


def test_ragged_umc_sgd_tight_parity(umc_dataset):
    """THE sharp check: per-member SGD trajectories of a ragged UMC gang
    match the standalone runs at float-rounding tolerance — any idle-step
    leak, schedule misindexing, RNG misfold, or eval-padding bug would
    blow this up by orders of magnitude."""
    cfgs = [_umc_cfg(sd, op="SGD") for sd in (1, 2)]
    gang = train_gang(cfgs, umc_dataset)
    singles = [train_model(c, umc_dataset) for c in cfgs]
    _tight(gang, singles)


def test_ragged_umc_adam_parity(umc_dataset):
    cfgs = [_umc_cfg(sd) for sd in (1, 2, 3)]
    gang = train_gang(cfgs, umc_dataset)
    singles = [train_model(c, umc_dataset) for c in cfgs]
    _assert_member_parity(gang, singles, loss_rtol=0.15, loss_atol=0.05)


def test_ragged_scan_matches_plain(umc_dataset):
    """K-step scan dispatch composes with the ragged masking: the (S, K)
    active/lr/β₁/sid lanes ride the scan xs."""
    cfgs = [_umc_cfg(sd, op="SGD", method="durmixmagwarp(0.2,4)+0.8")
            for sd in (1, 2)]
    plain = train_gang(cfgs, umc_dataset)
    scanned = train_gang(
        [_umc_cfg(sd, op="SGD", method="durmixmagwarp(0.2,4)+0.8",
                  steps_per_dispatch=2) for sd in (1, 2)],
        umc_dataset,
    )
    _tight(scanned, plain)


def test_ragged_mesh_matches_single_device(umc_dataset):
    """Member-axis sharding over a 2-device mesh (zero collectives) is
    numerically the same program."""
    cfgs = [_umc_cfg(sd, op="SGD") for sd in (1, 2)]
    plain = train_gang(cfgs, umc_dataset)
    meshed = train_gang(cfgs, umc_dataset, n_devices=2)
    _tight(meshed, plain)


def test_ragged_physionet_unequal_subsets():
    """PhysioNet seed_data subsets with different segment totals gang
    raggedly too (shared test split, unequal train sizes)."""
    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=8, segments_per_wav=3,
        sig_len=256, seed=7,
    )

    def cfg(sd, **kw):
        d = dict(
            dataset="PhysioNet", model="resnet9-5k", method="durratiomixup",
            num_epochs=2, batch_size=16, sig_len=256, n_fraction=0.5,
            seed_data=sd, op="SGD", save_artifacts=False,
            loader_parity="numpy",
        )
        d.update(kw)
        return TrainConfig(**d)

    sizes = {}
    for i in range(1, 13):
        tr, _ = build_splits(cfg(1100000 + i), ds)
        sizes.setdefault(len(tr), []).append(1100000 + i)
    assert len(sizes) >= 2, "probe produced no unequal subsets"
    two = sorted(sizes)[:2]
    cfgs = [cfg(sizes[two[0]][0]), cfg(sizes[two[1]][0])]
    gang = train_gang(cfgs, ds)
    singles = [train_model(c, ds) for c in cfgs]
    _tight(gang, singles)


def test_ragged_physionet_valid_cv_folds():
    """valid=True grids (the reference's 5-fold CV mode,
    dataloader_physionet.py:113-149) gang raggedly: the run seed selects
    the validation fold (fold = seed−1), so train sizes and eval splits
    both differ per member."""
    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=8, segments_per_wav=3,
        sig_len=256, seed=7,
    )
    cfgs = [
        TrainConfig(
            dataset="PhysioNet", model="resnet9-5k", method="durratiomixup",
            num_epochs=2, batch_size=16, sig_len=256, valid=True,
            seed=s, op="SGD", save_artifacts=False,
            loader_parity="numpy",
        )
        for s in (1, 2)
    ]
    (tr1, te1), (tr2, te2) = (build_splits(c, ds) for c in cfgs)
    assert set(te1.wav) != set(te2.wav), "CV folds should differ"
    gang = train_gang(cfgs, ds)
    singles = [train_model(c, ds) for c in cfgs]
    _tight(gang, singles)


def test_forced_ragged_on_equal_members_matches_equal_path(umc_dataset):
    """Driving EQUAL members through the ragged machinery (all steps
    active, shared test split) reproduces the equal path — isolates the
    runtime-schedule injection and masking plumbing from actual
    raggedness."""
    cfgs = [_umc_cfg(1, op="SGD", seed=s) for s in (1, 2)]
    splits = [build_splits(c, umc_dataset) for c in cfgs]
    assert len(splits[0][0]) == len(splits[1][0])
    equal = train_gang(cfgs, umc_dataset)
    ragged = _train_gang_ragged(cfgs, umc_dataset, splits)
    _tight(ragged, equal)


def test_ragged_production_config_smoke(umc_dataset):
    """The shipping fast config composes with raggedness: bf16 compute +
    K-step scan dispatch + vmap-batched Pallas mix kernels (interpret mode
    on CPU).  Smoke-level (bf16 shifts values): finite losses, correct
    per-member step counts, eval ran."""
    cfgs = [
        _umc_cfg(sd, method="durmixmagwarp(0.2,4)+0.8",
                 compute_dtype="bfloat16", steps_per_dispatch=2,
                 use_pallas=True, pallas_interpret=True)
        for sd in (1, 2)
    ]
    gang = train_gang(cfgs, umc_dataset)
    steps = [p["steps"][-1] for p in gang]
    assert steps[0] != steps[1], "fixture should be ragged"
    for p in gang:
        assert np.isfinite(np.asarray(p["train_loss"], np.float64)).all()
        assert len(p["test_accuracy"]) >= 2


def test_ragged_2d_spectrogram_cv_folds():
    """2-D (spectrogram) ragged gang via valid=True CV folds — per-member
    validation splits and train sizes on the channelled from_dict base."""
    from pcgmix_tpu.data import synthetic_spectrogram_dict

    ds = synthetic_spectrogram_dict(num_wavs_train=16, num_wavs_test=6,
                                    size=32)
    cfgs = [
        TrainConfig(
            dataset="PhysioNet(spec128)", model="resnet9",
            method="durratiomixup", num_epochs=2, batch_size=8,
            valid=True, seed=s, op="SGD", save_artifacts=False,
            loader_parity="numpy",
        )
        for s in (1, 2)
    ]
    (tr1, te1), (tr2, te2) = (build_splits(c, ds) for c in cfgs)
    assert set(te1.wav) != set(te2.wav), "CV folds should differ"
    gang = train_gang(cfgs, ds)
    singles = [train_model(c, ds) for c in cfgs]
    # the 2-D model's vmapped spatial-BN reductions amplify reassociation
    # well past the 1-D level even under SGD (measured ~0.5% by epoch 2;
    # the equal-path 2-D test is loose for the same reason) — the sharp
    # ragged semantics are pinned by the 1-D SGD tests above, which share
    # all the machinery; here the discriminative member↔data pairing check
    # carries the semantic weight
    _assert_member_parity(gang, singles, loss_rtol=8e-2, loss_atol=1e-2)


def test_equal_members_route_to_equal_path(umc_dataset, monkeypatch):
    """Same-fold members must NOT pay the ragged overhead (and must keep
    the equal path's bit-parity properties)."""
    import pcgmix_tpu.train.gang as gang_mod

    def boom(*a, **k):
        raise AssertionError("equal members routed to the ragged path")

    monkeypatch.setattr(gang_mod, "_train_gang_ragged", boom)
    cfgs = [_umc_cfg(1, seed=s, num_epochs=1) for s in (1, 2)]
    perfs = train_gang(cfgs, umc_dataset)
    assert len(perfs) == 2


def test_ragged_rejects_latent_methods(umc_dataset):
    cfgs = [_umc_cfg(sd, method="latentmixup") for sd in (1, 2)]
    with pytest.raises(ValueError, match="ragged gang cannot run latent"):
        train_gang(cfgs, umc_dataset)


def test_ragged_checkpoint_resume(umc_dataset, tmp_path, monkeypatch):
    """Crash mid-gang → rerun resumes from the stacked checkpoint with
    per-member step counts and per-member engine-stream replay at each
    member's OWN step count (magnitudewarp consumes the mirror stream)."""
    from pcgmix_tpu.train.checkpoint import CheckpointManager

    def cfgs(root):
        return [
            _umc_cfg(sd, num_epochs=3, checkpoint_every=1,
                     method="magnitudewarp(0.2,4)", op="SGD",
                     save_artifacts=True, plot=False, experiments_root=root)
            for sd in (1, 2)
        ]

    ref = train_gang(cfgs(str(tmp_path / "ref")), umc_dataset)

    calls = {"n": 0}
    orig_save = CheckpointManager.save

    def crashing_save(self, step, state, metrics=None):
        orig_save(self, step, state, metrics)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(CheckpointManager, "save", crashing_save)
    with pytest.raises(RuntimeError, match="simulated crash"):
        train_gang(cfgs(str(tmp_path / "run")), umc_dataset)
    monkeypatch.setattr(CheckpointManager, "save", orig_save)

    resumed = train_gang(cfgs(str(tmp_path / "run")), umc_dataset)
    gang_ck = os.path.join(str(tmp_path / "run"), ".gang_checkpoints")
    assert not os.path.isdir(gang_ck) or not os.listdir(gang_ck)
    for r, f in zip(resumed, ref):
        np.testing.assert_allclose(r["train_loss"], f["train_loss"], rtol=1e-5)
        np.testing.assert_allclose(r["test_loss"], f["test_loss"], rtol=1e-5)
        assert r["epochs"] == f["epochs"]
        assert r["steps"] == f["steps"]
    for cfg in cfgs(str(tmp_path / "run")):
        from pcgmix_tpu.exp.dirs import experiment_dir

        assert os.path.exists(
            os.path.join(experiment_dir(cfg), "model.msgpack")
        )
