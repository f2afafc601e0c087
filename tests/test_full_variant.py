"""PhysioNet "full" multi-cycle variant (databuilder.ipynb cell 23):
frames padded to 28 with −1, keep-duration plans emitting K>4 pieces
(VERDICT r1 missing #3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine, frames_end
from pcgmix_tpu.data import synthetic_physionet_full_dict
from pcgmix_tpu.data.builder import scan_full_windows

B, C, T, F = 8, 4, 900, 28


def _full_batch(seed=0):
    rng = np.random.default_rng(seed)
    frames = np.full((B, F), -1, np.int64)
    for i in range(B):
        # 6..10 cycles of 4 segments; keep boundaries <= T
        bounds = [0]
        while bounds[-1] <= T and len(bounds) < F + 4:
            bounds.extend(bounds[-1] + np.cumsum(rng.integers(15, 60, size=4)))
        valid = [b for b in bounds if b <= T][:F]
        frames[i, : len(valid)] = valid
    data = rng.normal(size=(B, C, T)).astype(np.float32)  # full window: no zero tail
    labels = (np.arange(B) % 2).astype(np.int64)
    return data, frames, labels


def _valid_count(f):
    return int((f >= 0).sum())


def test_frames_end_full_variant():
    _, frames, _ = _full_batch()
    ends = frames_end(frames)
    for i in range(B):
        assert ends[i] == frames[i, _valid_count(frames[i]) - 1]


def test_keepdur_blend_multicycle_matches_oracle():
    data, frames, labels = _full_batch(seed=3)
    eng = AugmentEngine(AugmentConfig("durratiomixup", B, C, T, model="resnet9"))
    step = 5
    plan = eng.plan(step, frames, labels)
    assert plan.arrays["len"].shape[1] == F - 1  # K = 27 pieces
    assert (plan.arrays["len"] > 0).sum(axis=1).min() > 4, "multi-cycle blending"
    out, _ = eng.apply(
        jnp.asarray(data), jnp.asarray(np.eye(2, dtype=np.float32)[labels]),
        plan.arrays,
    )
    out = np.asarray(out)

    # NumPy oracle: per valid segment common to both rows, blend the
    # min-length windows aligned at segment starts (the keepdur semantics of
    # augmentations.py:289-338 extended over every cycle in the window)
    lam = float(plan.arrays["lam"])
    mix = plan.arrays["mix"]
    expect = data.copy()
    for i in range(B):
        f1, f2 = frames[i], frames[mix[i]]
        n = min(_valid_count(f1), _valid_count(f2)) - 1
        for k in range(n):
            L = min(f1[k + 1] - f1[k], f2[k + 1] - f2[k])
            a, b = f1[k], f2[k]
            expect[i, :, a : a + L] = (
                expect[i, :, a : a + L] * lam
                + data[mix[i]][:, b : b + L] * (1 - lam)
            )
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_keepdur_cut_multicycle_swaps_sys_dia_every_cycle():
    data, frames, labels = _full_batch(seed=7)
    eng = AugmentEngine(AugmentConfig("durratiocutmix", B, C, T, model="resnet9"))
    plan = eng.plan(2, frames, labels)
    out = np.asarray(
        eng.apply(
            jnp.asarray(data),
            jnp.asarray(np.eye(2, dtype=np.float32)[labels]),
            plan.arrays,
        )[0]
    )
    mix = plan.arrays["mix"]
    expect = data.copy()
    for i in range(B):
        f1, f2 = frames[i], frames[mix[i]]
        n = min(_valid_count(f1), _valid_count(f2)) - 1
        for k in range(n):
            if k % 4 not in (1, 3):
                continue  # S1/S2 untouched, systole/diastole swapped per cycle
            L = min(f1[k + 1] - f1[k], f2[k + 1] - f2[k])
            expect[i, :, f1[k] : f1[k] + L] = data[mix[i]][:, f2[k] : f2[k] + L]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_concat_methods_reject_full_frames():
    data, frames, labels = _full_batch()
    eng = AugmentEngine(AugmentConfig("labelcutmix", B, C, T, model="resnet9"))
    with pytest.raises(NotImplementedError, match="single-cycle"):
        eng.plan(0, frames, labels)


def test_timemask_full_variant_uses_last_valid_boundary():
    data, frames, labels = _full_batch(seed=1)
    eng = AugmentEngine(AugmentConfig("timemask", B, C, T, model="resnet9"))
    plan = eng.plan(0, frames, labels)
    bb = plan.arrays["bb"]
    ends = frames_end(frames)
    assert (bb[:, 1] <= ends).all() and (bb >= 0).all()


def test_scan_full_windows_contract():
    # synthetic annotation stream: states cycle S1..diastole, with one noisy
    # window and a clipped first S1
    frames = np.array([0, 50, 120, 160, 260, 310, 380, 420, 530, 570,
                       650, 700, 800])
    states = ["S1", "systole", "S2", "diastole"] * 3 + ["S1"]
    wins = scan_full_windows(frames, states, n_samples=900, sig_len=500,
                             max_frames=28)
    # i=0 skipped (clipped first state); starts at later S1s with >=500
    # samples left and another S1 after
    starts = [s for s, _ in wins]
    assert starts == [260]
    f = wins[0][1]
    assert f[0] == 0 and f.shape == (28,)
    valid = f[f >= 0]
    assert (np.diff(valid) > 0).all() and valid.max() <= 500
    # window offsets are the annotation boundaries shifted by the start
    np.testing.assert_array_equal(
        valid, np.array([0, 50, 120, 160, 270, 310, 390, 440])
    )
    # noise marker BEFORE the window start is harmless...
    states_noisy = list(states)
    states_noisy[1] = "N"
    wins2 = scan_full_windows(frames, states_noisy, 900, 500, 28)
    assert [s for s, _ in wins2] == [260]
    # ...but noise inside the covered states kills the window
    states_noisy2 = list(states)
    states_noisy2[6] = "N"
    assert scan_full_windows(frames, states_noisy2, 900, 500, 28) == []


def test_full_variant_training_smoke():
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_full_dict(
        num_wavs_train=12, num_wavs_test=4, windows_per_wav=2,
        sig_len=512, seed=2,
    )
    assert ds["train"]["frames"].shape[1] == 28
    perf = train_model(
        TrainConfig(
            model="resnet9-5k", method="durmixmagwarp(0.2,4)+0.8",
            num_epochs=2, batch_size=8, sig_len=512, train_balance=False,
            save_artifacts=False, loader_parity="numpy",
        ),
        ds,
    )
    assert np.isfinite(perf["train_loss"]).all()
    assert len(perf["test_accuracy"]) >= 1


def test_cont_cutmix_rejects_full_frames():
    """cont-cutmix rewrites the frames vector like its concat-family
    siblings; on the full variant it would silently zero the real signal
    tail, so it must raise (regression: it was missing from the guard)."""
    data, frames, labels = _full_batch()
    eng = AugmentEngine(AugmentConfig("cont-cutmix", B, C, T, model="resnet9"))
    with pytest.raises(NotImplementedError, match="single-cycle"):
        eng.plan(0, frames, labels)


def test_gaussiannoise_full_variant_keeps_tail():
    """Full-variant windows carry real signal to sig_len — gaussiannoise's
    zero_after must not erase [frames_end, T) (regression)."""
    data, frames, labels = _full_batch(seed=11)
    eng = AugmentEngine(AugmentConfig(
        "gaussiannoise(25,40)", B, C, T, model="resnet9"
    ))
    plan = eng.plan(0, frames, labels)
    tohe = np.eye(2, dtype=np.float32)[labels]
    out, _ = eng.apply(jnp.asarray(data), jnp.asarray(tohe), plan.arrays)
    out = np.asarray(out)
    ends = frames_end(frames)
    assert (ends < T).any(), "fixture must exercise a short last boundary"
    for i in range(B):
        tail = out[i, :, ends[i]:]
        assert tail.size == 0 or np.abs(tail).max() > 0, f"row {i} tail zeroed"
