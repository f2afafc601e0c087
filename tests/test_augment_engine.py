"""End-to-end plan+apply tests for the augmentation engine.

Each test emulates the reference RNG protocol *independently* (direct
random.Random / np.random.seed calls, per SURVEY.md §2.5) and checks the
engine reproduces the same tensors.
"""

import random as pyrandom

import numpy as np
import jax.numpy as jnp
import pytest

from pcgmix_tpu.augment import AugmentEngine
from pcgmix_tpu.augment.engine import AugmentConfig

from .conftest import make_frames
from .oracles import (
    concat_cutmix_oracle,
    cutmix_keepdur_oracle,
    magnitude_warp_oracle,
    mixup_keepdur_oracle,
    swapsysdia_oracle,
)

B, C, T = 8, 4, 512
STEP = 37


def ref_same_label_mix(labels, seed):
    groups = {}
    for i, t in enumerate(labels):
        groups.setdefault(int(t), []).append(i)
    mix = np.arange(len(labels))
    for k in groups:
        idxs = groups[k]
        mix[idxs] = pyrandom.Random(seed).sample(list(mix[idxs]), len(idxs))
    return mix


def make_batch(rng):
    data = rng.normal(size=(B, C, T)).astype(np.float32)
    frames = make_frames(rng, B, T, min_seg=10, max_seg=60)
    for i in range(B):
        data[i, :, frames[i, -1] :] = 0.0
    labels = np.array([0, 1] * (B // 2))
    target = np.eye(2, dtype=np.float32)[labels]
    return data, frames, labels, target


def cfg_for(method, **kw):
    return AugmentConfig(
        method=method, batch_size=B, num_channels=C, sig_len=T, **kw
    )


def run(method, rng, **kw):
    data, frames, labels, target = make_batch(rng)
    eng = AugmentEngine(cfg_for(method, **kw))
    plan = eng.plan(STEP, frames, labels, wavs=[f"a{i:04d}" for i in range(B)])
    assert plan is not None
    out, tgt = eng.apply(jnp.asarray(data), jnp.asarray(target), plan.arrays)
    return data, frames, labels, target, plan, np.asarray(out), np.asarray(tgt)


def test_durratiomixup_reference_protocol(rng):
    data, frames, labels, target, plan, out, tgt = run("durratiomixup", rng)
    mix = ref_same_label_mix(labels, STEP)
    np.testing.assert_array_equal(plan.mix_indices, mix)
    np.random.seed(STEP)
    lam = np.random.beta(1, 1)
    for i in range(B):
        exp = mixup_keepdur_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]], lam)
        np.testing.assert_allclose(out[i], exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(tgt, target)  # same-class: labels unchanged


def test_durratiomixup_rand(rng):
    data, frames, labels, target, plan, out, tgt = run("(rand)durratiomixup", rng)
    mix = plan.mix_indices
    np.random.seed(STEP)
    lam = np.random.beta(1, 1)
    for i in range(B):
        exp = mixup_keepdur_oracle(
            data[i], data[mix[i]], frames[i], frames[mix[i]], lam, rand_seed=STEP
        )
        np.testing.assert_allclose(out[i], exp, rtol=1e-5, atol=1e-6)


def test_durmixmagwarp_reference_protocol(rng):
    data, frames, labels, target, plan, out, tgt = run("durmixmagwarp(0.2,4)", rng)
    mix = plan.mix_indices
    # reference stream: seed(step) → beta → normal knots (augmentations.py:661,677)
    np.random.seed(STEP)
    lam = np.random.beta(1, 1)
    knots = np.random.normal(1.0, 0.2, size=(B, 6, C))
    mixed = np.stack(
        [
            mixup_keepdur_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]], lam)
            for i in range(B)
        ]
    )
    exp = magnitude_warp_oracle(
        np.transpose(mixed, (0, 2, 1)), 0.2, 4, knots=knots
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(out, exp, rtol=1e-3, atol=2e-5)


def test_durratiocutmix(rng):
    data, frames, labels, target, plan, out, tgt = run("durratiocutmix", rng)
    mix = plan.mix_indices
    for i in range(B):
        exp = cutmix_keepdur_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]])
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)


def test_apply_probability_gate(rng):
    data, frames, labels, target = make_batch(rng)
    eng = AugmentEngine(cfg_for("durratiomixup+0.5"))
    decisions = []
    for step in range(40):
        plan = eng.plan(step, frames, labels)
        # reference gate: skip iff Random(step).uniform(0,1) >= 0.5
        expected = pyrandom.Random(step).uniform(0, 1) < 0.5
        decisions.append(plan is not None)
        assert (plan is not None) == expected
    assert any(decisions) and not all(decisions)


def test_mixup_mix_blends_targets(rng):
    data, frames, labels, target, plan, out, tgt = run("mixup(mix)", rng)
    mix = pyrandom.Random(STEP).sample(list(np.arange(B)), B)
    np.testing.assert_array_equal(plan.mix_indices, mix)
    np.random.seed(STEP)
    lam = np.random.beta(1, 1)
    np.testing.assert_allclose(
        out, data * lam + data[mix] * (1 - lam), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        tgt, target * lam + target[mix] * (1 - lam), rtol=1e-6, atol=1e-6
    )


def test_timemask(rng):
    data, frames, labels, target, plan, out, tgt = run("timemask(0.2)", rng)
    gap = pyrandom.Random(STEP + 131071).uniform(0, 0.2)
    f1 = pyrandom.Random(STEP + 13119).uniform(0, 1 - gap)
    f2 = f1 + gap
    exp = data.copy()
    for i in range(B):
        L = frames[i, -1]
        exp[i, :, int(f1 * L) : int(f2 * L)] = 0
    np.testing.assert_array_equal(out, exp)


def test_labelcutmix_concat(rng):
    data, frames, labels, target, plan, out, tgt = run("labelcutmix", rng)
    mix = plan.mix_indices
    for i in range(B):
        exp, f_new = concat_cutmix_oracle(
            data[i], data[mix[i]], frames[i], frames[mix[i]], 2, T
        )
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(plan.frames_new[i], f_new)


def test_labelcutmix_smooth(rng):
    data, frames, labels, target, plan, out, tgt = run("(smooth)labelcutmix", rng)
    mix = plan.mix_indices
    for i in range(B):
        exp, _ = concat_cutmix_oracle(
            data[i], data[mix[i]], frames[i], frames[mix[i]], 2, T, smooth=True
        )
        np.testing.assert_allclose(out[i], exp, rtol=1e-4, atol=1e-5)


def test_swapsysdia(rng):
    data, frames, labels, target, plan, out, tgt = run("swapsysdia", rng)
    mix = plan.mix_indices
    lams = []
    for i in range(B):
        exp, lam = swapsysdia_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]], T)
        lams.append(lam)
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)
    lams = np.float32(lams)[:, None]
    np.testing.assert_allclose(tgt, target * lams + target[mix] * (1 - lams), rtol=1e-5)


def test_gaussiannoise_snr_and_tail(rng):
    data, frames, labels, target, plan, out, tgt = run("gaussiannoise(25,40)", rng)
    # zero-padded tails stay zero (augmentations.py:1076)
    for i in range(B):
        assert np.all(out[i, :, frames[i, -1] :] == 0.0)
    # noise level is in the right ballpark: SNR ≥ 25 dB ⇒ tiny perturbation
    rel = np.abs(out[:, :, :100] - data[:, :, :100]).mean() / np.abs(data).mean()
    assert 0 < rel < 0.2


def test_s1s2mask(rng):
    data, frames, labels, target, plan, out, tgt = run("s1s2mask", rng)
    exp = data.copy()
    for i in range(B):
        exp[i, :, frames[i, 0] : frames[i, 1]] = 0
        exp[i, :, frames[i, 2] : frames[i, 3]] = 0
    np.testing.assert_array_equal(out, exp)


def test_lengthcutmix_with_cutout(rng):
    """Composed 'cutout' modifier zeroes the [cf1, cf2)·f_new[-1] window of
    the spliced instance (augmentations.py:1140-1148)."""
    data, frames, labels, target, plan, out, tgt = run(
        "lengthcutmix(5bins)cutout", rng
    )
    lo, hi = sorted(
        pyrandom.Random(STEP + k * 131071).uniform(0, 1) for k in range(2)
    )
    for i in range(B):
        exp, f_new = concat_cutmix_oracle(
            data[i], data[plan.mix_indices[i]], frames[i],
            frames[plan.mix_indices[i]], 2, T,
        )
        bb0, bb1 = int(lo * f_new[-1]), int(hi * f_new[-1])
        exp[:, bb0:bb1] = 0
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)


def test_base_method_is_noop():
    eng = AugmentEngine(cfg_for("base"))
    assert not eng.enabled
    assert eng.plan(0, np.zeros((B, 5), int), np.zeros(B, int)) is None


def test_2d_durratiomixup(rng):
    F = 16
    data = rng.normal(size=(B, 1, F, T)).astype(np.float32)
    frames = make_frames(rng, B, T, min_seg=10, max_seg=60)
    labels = np.array([0, 1] * (B // 2))
    target = np.eye(2, dtype=np.float32)[labels]
    eng = AugmentEngine(
        cfg_for("durratiomixup", spectrogram=True, spec_freq=F)
    )
    plan = eng.plan(STEP, frames, labels)
    out, _ = eng.apply(jnp.asarray(data), jnp.asarray(target), plan.arrays)
    out = np.asarray(out)
    mix = plan.mix_indices
    np.random.seed(STEP)
    lam = np.random.beta(1, 1)
    for i in range(B):
        exp = mixup_keepdur_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]], lam)
        np.testing.assert_allclose(out[i], exp, rtol=1e-5, atol=1e-6)
