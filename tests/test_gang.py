"""Gang training (vmap over the seed grid) — parity vs single runs.

The reference executes its seed grids strictly sequentially
(experiments_timeseries.ipynb cell 13); gang mode trains all members in one
vmapped program (pcgmix_tpu/train/gang.py).  Each member must reproduce its
standalone train_model run: same splits, same plans (step-seeded reference
RNG), same metrics up to vmap-batched float reassociation.
"""

import os

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.train import TrainConfig, train_gang, train_model
from pcgmix_tpu.train.gang import gang_ineligible_reason, group_gangable


@pytest.fixture(scope="module")
def tiny_dataset():
    return synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=8, segments_per_wav=3, sig_len=512, seed=7
    )


@pytest.fixture(scope="module")
def seed_datas(tiny_dataset):
    """Four seed_data values whose train subsets are equal-sized (segment
    counts per recording vary, so seed_data subsets differ in size).  These
    tests pin the EQUAL-size gang path, so sizes are matched here directly
    (group_gangable no longer splits buckets by size — the ragged path
    handles unequal members; see test_gang_ragged.py)."""
    from pcgmix_tpu.train.loop import build_splits

    sizes: dict = {}
    for i in range(1, 17):
        c = _cfg(seed_data=1100000 + i)
        tr, _ = build_splits(c, tiny_dataset)
        sizes.setdefault(len(tr), []).append(c.seed_data)
    groups = [v for v in sizes.values() if len(v) >= 4]
    assert groups, "probe range yielded no 4-member equal-sized group"
    return groups[0][:4]


def _cfg(**kw):
    defaults = dict(
        dataset="PhysioNet",
        model="resnet9-5k",
        method="base",
        num_epochs=3,
        batch_size=16,
        sig_len=512,
        n_fraction=0.5,  # <1 so seed_data actually selects different subsets
        save_artifacts=False,
        loader_parity="numpy",
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _members(seed_datas, **kw):
    return [_cfg(seed_data=sd, **kw) for sd in seed_datas]


def _assert_member_parity(gang_perfs, single_perfs, loss_rtol=1e-2,
                          loss_atol=1e-4):
    """Gang vs single runs match modulo float reassociation: the vmapped
    program batches the convs/reductions differently, so per-step rounding
    differs at ~1e-7 and Adam amplifies it on small-gradient parameters
    (update ≈ sign(g) near eps).  On this box even two identical
    train_model runs in different processes differ by ~1.4e-3 relative
    (the persistent XLA-CPU cache holds executables compiled for another
    machine type), so tolerances must cover cross-program noise, not just
    vmap: measured gang-vs-single ≤ 1.5e-3 rel, single-step parity 1e-6.
    Prediction-level parity replaces accuracy tolerances (VERDICT r3 weak
    #2): when a member's loss trajectory matches its single run at
    rtol 1e-3 the per-wav recording votes must be IDENTICAL at every plot
    epoch; under looser (Adam-amplified) divergence individual boundary
    recordings may legitimately flip, so votes must still agree on ≥75% of
    (epoch, wav) cells — a one-recording flip on a tiny eval set can no
    longer pass vacuously.

    The discriminative check below is what actually proves member↔data
    pairing: each gang member's loss trajectory must be (much) closer to
    its OWN single run than to any other member's.
    """
    for g, s in zip(gang_perfs, single_perfs):
        np.testing.assert_allclose(
            g["train_loss"], s["train_loss"], rtol=loss_rtol, atol=loss_atol
        )
        np.testing.assert_allclose(
            g["test_loss"], s["test_loss"], rtol=loss_rtol, atol=loss_atol
        )
        gv, sv = g["test_wav_preds"], s["test_wav_preds"]
        assert len(gv) == len(sv) and all(
            e_g.keys() == e_s.keys() for e_g, e_s in zip(gv, sv)
        )
        if np.allclose(g["train_loss"], s["train_loss"], rtol=1e-3):
            assert gv == sv, "tight trajectory but recording votes differ"
        else:
            agree = np.mean([
                e_g[w] == e_s[w] for e_g, e_s in zip(gv, sv) for w in e_g
            ])
            assert agree >= 0.75, f"vote agreement {agree:.2f} < 0.75"
        assert g["epochs"] == s["epochs"]
        assert g["steps"] == s["steps"]
    if len(gang_perfs) >= 2:
        # member↔data pairing: own single run is the nearest trajectory
        trajs = [np.asarray(s["train_loss"]) for s in single_perfs]
        if not all(
            np.allclose(trajs[0], t, rtol=1e-3) for t in trajs[1:]
        ):  # members with identical data orders can't be discriminated
            for i, g in enumerate(gang_perfs):
                d = [
                    float(np.linalg.norm(np.asarray(g["train_loss"]) - t))
                    for t in trajs
                ]
                assert int(np.argmin(d)) == i, (
                    f"gang member {i} nearest to single run {int(np.argmin(d))}"
                )


def test_gang_base_matches_single_runs(tiny_dataset, seed_datas):
    cfgs = _members(seed_datas[:3])
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    # the three members see different seed_data subsets: they must differ
    assert (
        gang[0]["train_loss"] != gang[1]["train_loss"]
        or gang[0]["test_accuracy"] != gang[1]["test_accuracy"]
    )
    _assert_member_parity(gang, singles)


def test_gang_pcgmix_matches_single_runs(tiny_dataset, seed_datas):
    cfgs = _members(seed_datas[:3], method="durratiomixup")
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles)


def test_gang_scan_matches_plain_gang(tiny_dataset, seed_datas):
    cfgs = _members(seed_datas[:3], method="durmixmagwarp(0.2,4)+0.8")
    plain = train_gang(cfgs, tiny_dataset)
    scanned = train_gang(
        [_cfg(seed_data=sd, method="durmixmagwarp(0.2,4)+0.8",
              steps_per_dispatch=2) for sd in seed_datas[:3]],
        tiny_dataset,
    )
    _assert_member_parity(scanned, plain)


def test_gang_mesh_matches_single_device(tiny_dataset, seed_datas):
    cfgs = [_cfg(seed_data=sd, method="durratiomixup", num_epochs=2)
            for sd in seed_datas]
    plain = train_gang(cfgs, tiny_dataset)
    meshed = train_gang(cfgs, tiny_dataset, n_devices=4)
    _assert_member_parity(meshed, plain)


def test_gang_mesh_scan_composition(tiny_dataset, seed_datas):
    """The full production shape at once: member-axis mesh sharding × K-step
    scan dispatch × plan-based method — must match the plain gang."""
    kw = dict(method="durmixmagwarp(0.2,4)+0.8", num_epochs=2)
    plain = train_gang(_members(seed_datas[:4], **kw), tiny_dataset)
    fused = train_gang(
        _members(seed_datas[:4], steps_per_dispatch=2, **kw),
        tiny_dataset, n_devices=4,
    )
    _assert_member_parity(fused, plain)


def test_gang_latentmixup_matches_single_runs(tiny_dataset, seed_datas):
    """Split-forward methods gang per-step through per-depth programs."""
    cfgs = _members(seed_datas[:2], method="latentmixup", num_epochs=2)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles)


def test_gang_manifold_matches_single_runs(tiny_dataset, seed_datas):
    cfgs = _members(seed_datas[:2], method="manifold-cutmix", num_epochs=2)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles)


def test_gang_gated_latentmixup_runs(tiny_dataset, seed_datas):
    """'+p' gating on a latent method: gated-off steps dispatch the plain
    step; the gate draw is member-uniform (step-seeded protocol)."""
    cfgs = _members(seed_datas[:2], method="latentmixup+0.5", num_epochs=2)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles)


def test_gang_same_cvd_matches_single_runs(tiny_dataset, seed_datas):
    """(sameCVD) pairing — the wav→diagnosis map flows through every
    member's plan engine (augmentations.py:26-28 front-end)."""
    wavs = sorted(set(tiny_dataset["train"]["wav"]))
    cvd_map = {w: ["CAD", "MVP", "Benign"][i % 3] for i, w in enumerate(wavs)}
    cfgs = _members(seed_datas[:2], method="(sameCVD)durratiomixup",
                    num_epochs=2, cvd_map=cvd_map)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles)


def test_gang_pallas_interpret_matches_xla(tiny_dataset, seed_datas):
    """Explicit use_pallas=True opt-in: jax vmap-batches the pallas_call
    over the member axis (interpret mode on CPU; the real-TPU lowering is
    exercised by bench_gang.py when a chip is attached)."""
    base_kw = dict(method="durratiomixup", num_epochs=2)
    xla = train_gang(_members(seed_datas[:2], **base_kw), tiny_dataset)
    pal = train_gang(
        _members(seed_datas[:2], use_pallas=True, pallas_interpret=True,
                 **base_kw),
        tiny_dataset,
    )
    _assert_member_parity(pal, xla)


def test_gang_bf16_scan_smoke(tiny_dataset, seed_datas):
    """The production fast config (bf16 + scan) through the gang."""
    cfgs = _members(seed_datas[:2], compute_dtype="bfloat16", num_epochs=2,
                    steps_per_dispatch=2, method="durmixmagwarp(0.2,4)")
    gang = train_gang(cfgs, tiny_dataset)
    for p in gang:
        assert np.isfinite(p["train_loss"]).all()
        assert len(p["test_accuracy"]) >= 1


def test_group_gangable_ineligible_are_singletons(tiny_dataset):
    """Ineligible configs (host-side analysis dumps) never share a bucket
    (each must run via train_model, even when otherwise identical)."""
    cfgs = [_cfg(classical_space=True, seed_data=sd)
            for sd in (1100001, 1100002)]
    groups = group_gangable(cfgs, tiny_dataset)
    assert [len(g) for g in groups] == [1, 1]


def test_group_gangable_groups_live_methods(tiny_dataset):
    """Live-model methods (lc-nointrusion/saliency-cutmix) now bucket
    together: the gang's stacked state IS the live model (gang.py
    live_mode); ragged members raise at train time and fall back."""
    cfgs = [_cfg(method="lc-nointrusion", seed_data=sd)
            for sd in (1100001, 1100002)]
    groups = group_gangable(cfgs, tiny_dataset)
    assert [len(g) for g in groups] == [2]


def test_group_gangable_merges_latent_methods_across_split_sizes(tiny_dataset):
    """Latent (split-forward) methods group regardless of split size/test
    identity: the ragged path dispatches per draw group, so each member's
    own-step-seeded depth/gate draws no longer force equal-size buckets
    (VERDICT r3 item 3)."""
    cfgs = [_cfg(seed_data=1100000 + i, method="latentmixup")
            for i in range(1, 9)]
    groups = group_gangable(cfgs, tiny_dataset)
    assert [len(g) for g in groups] == [8]


def test_group_gangable_merges_unequal_sizes_for_input_methods(tiny_dataset):
    """Non-latent methods group regardless of split size/test identity —
    the ragged gang path handles the inequality (test_gang_ragged.py)."""
    cfgs = [_cfg(seed_data=1100000 + i) for i in range(1, 9)]
    groups = group_gangable(cfgs, tiny_dataset)
    assert [len(g) for g in groups] == [8]


def test_gang_2d_spectrogram_matches_single_runs():
    """2-D (spectrogram) gang: same machinery, channelled from_dict base."""
    from pcgmix_tpu.data import synthetic_spectrogram_dict

    ds = synthetic_spectrogram_dict(num_wavs_train=16, num_wavs_test=6, size=32)
    cfgs = [
        TrainConfig(
            dataset="PhysioNet(spec128)", model="resnet9",
            method="durratiomixup", num_epochs=2, batch_size=8,
            n_fraction=0.5, seed_data=sd, save_artifacts=False,
            loader_parity="numpy",
        )
        for sd in (1100001, 1100002)
    ]
    gang = train_gang(cfgs, ds)
    singles = [train_model(c, ds) for c in cfgs]
    # the 2-D ResNet9 amplifies reassociation noise faster (small spatial
    # BN reductions + Adam near eps): measured 3.6% by epoch 2; the
    # discriminative nearest-own-trajectory check still binds members
    _assert_member_parity(gang, singles, loss_rtol=8e-2, loss_atol=1e-2)


def test_gang_umc_sgd_tight_parity():
    """UMC gang (members differ in epoch-shuffle seed; the patient fold is
    keyed by seed_data, so train/test splits are shared).  Regression for
    the base-label class swap: umc_split rewrites labels to rekomp=0/
    dekomp=1 after from_dict — the shared gang base must mirror it or every
    member trains on inverted targets (train_gang asserts this now).

    Uses plain SGD: without Adam's ~eps-denominator amplification the gang
    must match singles to float-rounding level over 48 steps (measured
    5e-7), making this the SHARP semantic check the Adam tests can't be."""
    from pcgmix_tpu.data.synthetic import synthetic_umc_dict

    ds = synthetic_umc_dict(segments_per_patient=3, sig_len=512)
    cfgs = [
        TrainConfig(
            dataset="UMC", model="resnet9-5k", method="durratiomixup",
            num_epochs=2, batch_size=8, seed_data=1, seed=s, sig_len=512,
            op="SGD", use_sched=False, save_artifacts=False,
            loader_parity="numpy",
        )
        for s in (1, 2)
    ]
    gang = train_gang(cfgs, ds)
    singles = [train_model(c, ds) for c in cfgs]
    for g, s in zip(gang, singles):
        # 48 steps compound per-step rounding to ~3e-4 even under SGD;
        # inverted labels would diverge by ~100% from step 1
        np.testing.assert_allclose(
            g["train_loss"], s["train_loss"], rtol=1e-3, atol=1e-6
        )
        # test_loss flows through the BN running-stat EMA and is measured
        # chaos-amplified to ~11% near convergence (gang-of-1 reproduces
        # it, so it is program-pair rounding, not a member bug)
        np.testing.assert_allclose(
            g["test_loss"], s["test_loss"], rtol=2e-1, atol=1e-4
        )
        # accuracy parity at the PREDICTION level (not a wide accuracy
        # tolerance, which a one-recording flip would satisfy vacuously):
        # tight train trajectory ⇒ per-wav votes must be identical;
        # otherwise ≥75% of (epoch, wav) cells must agree — the same
        # discipline `_assert_member_parity` applies.
        gv, sv = g["test_wav_preds"], s["test_wav_preds"]
        assert len(gv) == len(sv) and all(
            e_g.keys() == e_s.keys() for e_g, e_s in zip(gv, sv)
        )
        if np.allclose(g["train_loss"], s["train_loss"], rtol=1e-3):
            assert gv == sv, "tight trajectory but recording votes differ"
        else:
            agree = np.mean([
                e_g[w] == e_s[w] for e_g, e_s in zip(gv, sv) for w in e_g
            ])
            assert agree >= 0.75, f"vote agreement {agree:.2f} < 0.75"


def test_gang_sgd_tight_parity(tiny_dataset, seed_datas):
    """1-D SGD gang vs singles at float-rounding tolerance (see the UMC
    test's rationale): the sharp end-to-end check that gathers, plans,
    SELC indices and RNG are exactly the standalone runs'."""
    cfgs = _members(seed_datas[:3], method="durmixmagwarp(0.2,4)",
                    op="SGD", use_sched=False)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles, loss_rtol=1e-4, loss_atol=1e-6)


def test_gang_varying_seed_allowed(tiny_dataset):
    """Members may also differ in the epoch-shuffle seed."""
    cfgs = [_cfg(seed=1, num_epochs=2), _cfg(seed=2, num_epochs=2)]
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles)


def test_gang_artifacts(tiny_dataset, seed_datas, tmp_path):
    cfgs = [
        _cfg(seed_data=sd, num_epochs=2, save_artifacts=True, plot=False,
             experiments_root=str(tmp_path))
        for sd in seed_datas[:2]
    ]
    train_gang(cfgs, tiny_dataset)
    from pcgmix_tpu.exp.dirs import experiment_dir
    from pcgmix_tpu.utils import load_dict

    for cfg in cfgs:
        d = experiment_dir(cfg)
        assert os.path.exists(os.path.join(d, "performance.pkl"))
        assert os.path.exists(os.path.join(d, "model.msgpack"))
        perf = load_dict(os.path.join(d, "performance.pkl"))
        assert len(perf["test_accuracy"]) >= 1


def test_runner_gang_mode(tiny_dataset, seed_datas, tmp_path):
    """run_grid(gang=True): gangable points train together, odd-sized
    subsets fall back to sequential runs, artifacts satisfy the done/skip
    contract either way."""
    from pcgmix_tpu.exp.dirs import experiment_dir
    from pcgmix_tpu.exp.runner import run_grid

    base = _cfg(num_epochs=2, save_artifacts=True, plot=False,
                experiments_root=str(tmp_path))
    sds = seed_datas + [1100001]  # the extra one may or may not be gangable
    ran = run_grid(base, tiny_dataset, ["base"], [0.5], [1], seed_datas=sds,
                   robust=False, progress=False, gang=True)
    assert len(ran) == len(sds)
    for cfg in ran:
        d = experiment_dir(cfg)
        assert os.path.exists(os.path.join(d, "model.msgpack"))
        assert os.path.exists(os.path.join(d, "performance.pkl"))
    ran2 = run_grid(base, tiny_dataset, ["base"], [0.5], [1], seed_datas=sds,
                    robust=False, progress=False, gang=True)
    assert ran2 == []


def test_gang_checkpoint_resume(tiny_dataset, seed_datas, tmp_path, monkeypatch):
    """Crash mid-gang → rerun with the same cfg list resumes from the
    stacked-state orbax checkpoint and finishes identically to an
    uninterrupted gang (same process, same programs → near-bit-equal)."""
    import pcgmix_tpu.train.gang as gang_mod
    from pcgmix_tpu.train.checkpoint import CheckpointManager

    def cfgs(root):
        # magnitudewarp consumes the engine's cross-step mirror stream:
        # resume must replay it (loop.replay_plan_rng) or post-resume plans
        # silently differ from the uninterrupted run
        return [
            _cfg(seed_data=sd, num_epochs=3, checkpoint_every=1,
                 method="magnitudewarp(0.2,4)",
                 save_artifacts=True, plot=False, experiments_root=root)
            for sd in seed_datas[:2]
        ]

    ref = train_gang(cfgs(str(tmp_path / "ref")), tiny_dataset)

    # crash after the epoch-1 checkpoint lands
    calls = {"n": 0}
    orig_save = CheckpointManager.save

    def crashing_save(self, step, state, metrics=None):
        orig_save(self, step, state, metrics)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(CheckpointManager, "save", crashing_save)
    with pytest.raises(RuntimeError, match="simulated crash"):
        train_gang(cfgs(str(tmp_path / "run")), tiny_dataset)
    monkeypatch.setattr(CheckpointManager, "save", orig_save)

    resumed = train_gang(cfgs(str(tmp_path / "run")), tiny_dataset)
    # success deletes the gang checkpoint dir (a stale one would make a
    # future rerun of the same grid resume past all epochs)
    gang_ck = os.path.join(str(tmp_path / "run"), ".gang_checkpoints")
    assert not os.path.isdir(gang_ck) or not os.listdir(gang_ck)
    for r, f in zip(resumed, ref):
        np.testing.assert_allclose(r["train_loss"], f["train_loss"], rtol=1e-6)
        np.testing.assert_allclose(r["test_loss"], f["test_loss"], rtol=1e-6)
        assert r["epochs"] == f["epochs"]
    for cfg in cfgs(str(tmp_path / "run")):
        from pcgmix_tpu.exp.dirs import experiment_dir

        assert os.path.exists(os.path.join(experiment_dir(cfg), "model.msgpack"))


def test_gang_rejects_mixed_configs(tiny_dataset, seed_datas):
    cfgs = [_cfg(seed_data=seed_datas[0]), _cfg(seed_data=seed_datas[1],
                                                batch_size=8)]
    with pytest.raises(ValueError, match="differ only in"):
        train_gang(cfgs, tiny_dataset)


def test_gang_rejects_ineligible_method(tiny_dataset):
    with pytest.raises(ValueError, match="not gang-eligible"):
        train_gang([_cfg(classical_space=True)], tiny_dataset)


def test_ineligible_reasons():
    assert gang_ineligible_reason(_cfg()) is None
    assert gang_ineligible_reason(_cfg(method="durratiomixup")) is None
    assert gang_ineligible_reason(_cfg(method="SELCbase")) is None
    assert gang_ineligible_reason(_cfg(method="latentmixup")) is None
    assert gang_ineligible_reason(_cfg(method="manifold-cutmix")) is None
    assert gang_ineligible_reason(_cfg(checkpoint_every=2)) is None
    # live-model methods are eligible since round 5 (gang.py live_mode)
    assert gang_ineligible_reason(_cfg(method="lc-nointrusion")) is None
    assert gang_ineligible_reason(_cfg(method="saliency-cutmix")) is None
    for bad in (
        _cfg(method="(saloptenv-1)durratiomixup"),
        _cfg(method="(closestknn=8)durmixmagwarp(0.2,4)"),
        _cfg(classical_space=True),
        _cfg(latent_space=True),
        _cfg(track_variability=True),
    ):
        assert gang_ineligible_reason(bad) is not None
