"""Golden-oracle tests against the GENUINE reference 2-D augmentation code.

Imports /root/reference/augmentations2d.py (public untrusted content,
executed only as a numerical oracle on synthetic data) with its unavailable
heavy dependencies stubbed, and asserts that the spectrogram-mode
AugmentEngine.plan + apply reproduces the real 2-D ``augment`` dispatch
bit-exactly across methods × steps — including the (salopt…) path, whose
saliency maps are injected identically on both sides via a stubbed
``saliency.get_saliency_maps``.

Extends tests/test_reference_golden.py (1-D) to the 2-D engine; together
they demote the hand-written tests/oracles.py to fallback for every
dispatchable method family.
"""

import importlib.util
import os
import random as pyrandom
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine

REF_AUG2D = "/root/reference/augmentations2d.py"

B, C, F = 10, 1, 64  # reference assumes square spectrograms (spec_dim2 =
T = F                # data.shape[2], augmentations2d.py:300-301)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_AUG2D), reason="reference tree not available"
)

# mutable holder the stubbed saliency.get_saliency_maps reads from
_SAL = {"maps": None}


@pytest.fixture(scope="module")
def ref2d():
    """Import the genuine reference augmentations2d module with stubs."""

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        return m

    stubs = {
        "torchvision": _mod("torchvision"),
        "audiomentations": _mod("audiomentations", AddGaussianSNR=object),
        "tsp_solver": _mod("tsp_solver"),
        "tsp_solver.greedy": _mod("tsp_solver.greedy", solve_tsp=None),
        "tsp_solver.util": _mod("tsp_solver.util", path_cost=None),
        "saliency": _mod(
            "saliency",
            get_saliency_maps=lambda *a, **k: np.array(_SAL["maps"], copy=True),
        ),
        "train_model": _mod("train_model"),
        "utils": _mod("utils"),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_augmentations2d", REF_AUG2D
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _batch2d(seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(B, C, F, T)).astype(np.float32)
    lens = rng.integers(4, 16, size=(B, 4))
    frames = np.zeros((B, 5), np.int64)
    frames[:, 1:] = np.cumsum(lens, axis=1)
    labels = rng.integers(0, 2, size=B).astype(np.int64)
    wavs = [f"a{i:04d}_0" for i in range(B)]
    # smoothed-saliency stand-in: non-negative, zero past the beat end
    sal = np.abs(rng.normal(size=(B, T))).astype(np.float32)
    for i in range(B):
        sal[i, frames[i, -1]:] = 0.0
    return data, frames, labels, wavs, sal


def run_reference(ref, method, data, frames, labels, step):
    args = types.SimpleNamespace(
        method=method, batch_size=B, num_classes=2,
        dataset="PhysioNet(spec128)", model="resnet9",
    )
    result = ref.augment(
        args,
        torch.from_numpy(data.copy()),
        torch.from_numpy(np.eye(2, dtype=np.float32)[labels]),
        torch.from_numpy(frames.copy()),
        [f"a{i:04d}_0" for i in range(B)],
        types.SimpleNamespace(count=step),
        None,
        torch.device("cpu"),
        None,
    )
    out, t_out, mix = result[0], result[1], result[2]
    return np.asarray(out.detach()), np.asarray(t_out.detach()), np.asarray(mix)


def run_ours(method, data, frames, labels, wavs, step, sal=None):
    eng = AugmentEngine(
        AugmentConfig(
            method=method, batch_size=B, num_channels=C, sig_len=T,
            spec_freq=F, spectrogram=True, model="resnet9",
        )
    )
    plan = eng.plan(
        step, frames, labels, wavs,
        saliency_fn=(lambda mix_model=0: np.array(sal, copy=True))
        if sal is not None else None,
    )
    tohe = np.eye(2, dtype=np.float32)[labels]
    if plan is None:
        return data, tohe, None
    out, t2 = eng.apply(jnp.asarray(data), jnp.asarray(tohe), plan.arrays)
    return np.asarray(out), np.asarray(t2), plan.mix_indices


DISPATCH_METHODS_2D = [
    "durratiomixup",
    "(rand)durratiomixup",  # no (rand) branch in the 2-D keepdur blend
    "durratiomixup+0.5",
    "(saloptenv)durratiomixup",
    "(saloptsum)durratiomixup",
    "durratiocutmix",
    "cutmix",
    "(rand)cutmix",
    "mixup(same)",
    "mixup(mix)",
    "timemask",
    "timemask(0.3)",
    "timemask(0.3)+0.5",
    "freqmask",
    "freqmask(0.3)",
    "cutout",
    "cutout(0.3,0.4)",
    "durmixtimemask",
    "durmixtimemask(0.3)",
    "durmixfreqmask",
    "durmixfreqmask(0.3)",
    "durmixcutout",
    "durmixcutout(0.3,0.4)",
    "durmixcutout+0.6",
]

STEPS = [0, 3, 7]


@pytest.mark.parametrize("method", DISPATCH_METHODS_2D)
def test_2d_dispatch_matches_reference(ref2d, method):
    data, frames, labels, wavs, sal = _batch2d(seed=13)
    _SAL["maps"] = sal
    for step in STEPS:
        r_out, r_t, r_mix = run_reference(ref2d, method, data, frames, labels, step)
        o_out, o_t, o_mix = run_ours(
            method, data, frames, labels, wavs, step,
            sal=sal if "salopt" in method else None,
        )
        np.testing.assert_allclose(
            o_out, r_out, rtol=1e-5, atol=1e-6,
            err_msg=f"{method} step {step} data",
        )
        np.testing.assert_allclose(
            o_t, r_t, rtol=1e-6, atol=1e-7,
            err_msg=f"{method} step {step} target",
        )
        if o_mix is not None and np.size(r_mix):
            np.testing.assert_array_equal(
                o_mix, r_mix, err_msg=f"{method} step {step} mix indices"
            )


def _freq_axis_bug_oracle(data, frames, mix, step):
    """NumPy emulation of the reference 2-D '(rand)' cutmix-keepdur branch
    (augmentations2d.py:233-249): the displaced assignments drop the
    channel-axis colon, so ``d_new[:, a:b] = d2[:, c:d]`` slices the
    FREQUENCY axis of the (C, F, T) tensors instead of time."""
    out = data.copy()
    for i in range(len(data)):
        d1, f1 = out[i], frames[i]
        d2, f2 = data[mix[i]], frames[mix[i]]
        for k in (1, 3):  # systole, diastole
            l1 = f1[k + 1] - f1[k]
            l2 = f2[k + 1] - f2[k]
            lmin = min(l1, l2)
            gap = l2 - l1
            start = pyrandom.Random(step).randint(0, abs(gap))
            if gap >= 0:
                d1[:, f1[k]:f1[k + 1]] = d2[:, f2[k] + start:f2[k] + start + lmin]
            else:
                d1[:, f1[k] + start:f1[k] + start + lmin] = d2[:, f2[k]:f2[k + 1]]
    return out


def test_reference_2d_rand_durratiocutmix_is_broken(ref2d):
    """The reference's 2-D '(rand)durratiocutmix' applies the random
    displacement to the FREQUENCY axis (missing ':' for the channel dim,
    augmentations2d.py:233-249) — silently corrupting frequency rows instead
    of displacing time windows.  Our engine deliberately treats (rand) as a
    no-op in 2-D keepdur paths (the blend kernel has no (rand) branch at
    all, :206-221).  This test pins the reference bug bit-exactly via a
    NumPy emulation so the divergence is a documented decision."""
    data, frames, labels, wavs, _ = _batch2d(seed=29)
    for step in STEPS:
        r_out, _, r_mix = run_reference(
            ref2d, "(rand)durratiocutmix", data, frames, labels, step
        )
        emulated = _freq_axis_bug_oracle(data, frames, r_mix, step)
        np.testing.assert_allclose(
            r_out, emulated, rtol=1e-6, atol=1e-7,
            err_msg=f"freq-axis bug emulation step {step}",
        )
    # and the bug is material: it differs from the intent (plain swap)
    r_plain, _, _ = run_reference(
        ref2d, "durratiocutmix", data, frames, labels, 3
    )
    r_rand, _, _ = run_reference(
        ref2d, "(rand)durratiocutmix", data, frames, labels, 3
    )
    assert not np.allclose(r_plain, r_rand)


def test_2d_keepdur_kernel_matches_reference_directly(ref2d):
    """mixup_keepdur_multidim_tensors (augmentations2d.py:206-221) and the
    non-(rand) cutmix_keepdur (:223-232) on explicit pairs."""
    data, frames, labels, wavs, _ = _batch2d(seed=37)
    tohe = jnp.asarray(np.eye(2, dtype=np.float32)[labels])
    for i, j, seed in [(0, 1, 2), (2, 5, 3), (7, 4, 11)]:
        lam = ref2d.get_lambda(alpha=1, random_seed=seed)
        r = ref2d.mixup_keepdur_multidim_tensors(
            torch.from_numpy(data[i].copy()), torch.from_numpy(data[j].copy()),
            frames[i], frames[j],
            torch.tensor(np.float32(lam))[None, None, None],
            "durratiomixup", seed,
        )
        eng = AugmentEngine(AugmentConfig(
            method="durratiomixup", batch_size=B, num_channels=C, sig_len=T,
            spec_freq=F, spectrogram=True, model="resnet9",
        ))
        mix = np.arange(B)
        mix[i] = j
        plan = eng._plan_keepdur_blend(
            seed, frames, labels, lambda: (mix, None), None
        )
        out, _ = eng.apply(jnp.asarray(data), tohe, plan.arrays)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(r), rtol=1e-5, atol=1e-6,
            err_msg=f"2-D keepdur blend pair ({i},{j}) seed {seed}",
        )


def test_2d_latentmixup_dispatch_matches_reference(ref2d):
    """2-D latentmixup (augmentations2d.py:510-537): depth draw
    randint(1, 3) for resnet9, split-forward hook, latent blend — identical
    deterministic 'model' on both sides."""
    import types as _types

    data, frames, labels, wavs, _ = _batch2d(seed=59)

    def fake_first(x_np, depth):
        return (x_np * (depth + 0.5)).astype(np.float32)

    def ref_model(d, depth=None, pass_part=None):
        assert pass_part == "first"
        return torch.from_numpy(fake_first(np.asarray(d.detach()), depth))

    args = _types.SimpleNamespace(
        method="latentmixup", batch_size=B, num_classes=2,
        dataset="PhysioNet(spec128)", model="resnet9",
    )
    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine

    for step in STEPS:
        result = ref2d.augment(
            args,
            torch.from_numpy(data.copy()),
            torch.from_numpy(np.eye(2, dtype=np.float32)[labels]),
            torch.from_numpy(frames.copy()),
            [f"a{i:04d}_0" for i in range(B)],
            _types.SimpleNamespace(count=step),
            ref_model,
            torch.device("cpu"),
            None,
        )
        r_out, r_t, r_mix = (np.asarray(result[0].detach()),
                             np.asarray(result[1].detach()),
                             np.asarray(result[2]))
        eng = AugmentEngine(AugmentConfig(
            method="latentmixup", batch_size=B, num_channels=C, sig_len=T,
            spec_freq=F, spectrogram=True, model="resnet9",
        ))
        plan = eng.plan(step, frames, labels, wavs)
        assert plan.latent_depth == args.depth, f"depth draw at step {step}"
        latent = fake_first(data, plan.latent_depth)
        tohe = np.eye(2, dtype=np.float32)[labels]
        out, t2 = eng.apply(jnp.asarray(latent), jnp.asarray(tohe), plan.arrays)
        np.testing.assert_array_equal(plan.mix_indices, r_mix)
        np.testing.assert_allclose(
            np.asarray(out), r_out, rtol=1e-6, atol=1e-7,
            err_msg=f"2-D latentmixup step {step}",
        )
        np.testing.assert_allclose(np.asarray(t2), r_t, rtol=1e-6, atol=1e-7)
