"""Golden-oracle tests against the GENUINE reference augmentation code.

Imports /root/reference/augmentations.py (public untrusted content, executed
only as a numerical oracle on synthetic data) with its unavailable heavy
dependencies stubbed, and asserts that AugmentEngine.plan + apply reproduces
the real ``augment`` dispatch bit-exactly (fp tolerance for the spline
warps) across methods × steps.  This demotes the hand-written
tests/oracles.py from source-of-truth to fallback (VERDICT r1 missing #2).

Stub notes:
- tsp_solver.greedy.solve_tsp / python_tsp.solve_tsp_local_search are not in
  this image; BOTH sides use pcgmix_tpu.augment.tsp, so the closestknn/bins
  comparisons validate the distance/ranking/pair-reordering logic around the
  TSP call, not the TSP solver itself (disclosed; the upstream local search
  is stochastic anyway).
- latent_space.generate_latent_space is stubbed with a deterministic
  embedding fed identically to both sides.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pcgmix_tpu.augment import tsp as our_tsp
from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine

REF_AUG = "/root/reference/augmentations.py"

B, C, T = 12, 4, 384

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_AUG), reason="reference tree not available"
)


def _embed(data_np: np.ndarray) -> np.ndarray:
    """Deterministic latent embedding (B, 3C) used by both sides."""
    x = np.asarray(data_np, np.float64)
    return np.concatenate(
        [x.mean(-1), x.std(-1), np.abs(x).max(-1)], axis=1
    ).astype(np.float64)


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Import the genuine reference augmentations module with stubs."""
    root = tmp_path_factory.mktemp("refroot")
    cwd = root / "a" / "b" / "c"
    cwd.mkdir(parents=True)
    csvdir = root / "mnt" / "eol" / "Zacasno" / "davidsusic" / "CHF" / "data" / "physionet"
    csvdir.mkdir(parents=True)
    wavs, cvds = _wav_fixture()
    pd.DataFrame({"wav": sorted(set(wavs)),
                  "diagnosis": [cvds[w] for w in sorted(set(wavs))]}
                 ).to_csv(csvdir / "cvds_map.csv", index=False)

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        return m

    def check_folder(path):
        os.makedirs(path, exist_ok=True)
        return path

    def generate_latent_space(data):
        return _embed(np.asarray(data.detach().cpu()))

    stubs = {
        "torchvision": _mod("torchvision"),
        "audiomentations": _mod("audiomentations", AddGaussianSNR=object),
        "tsp_solver": _mod("tsp_solver"),
        "tsp_solver.greedy": _mod(
            "tsp_solver.greedy",
            solve_tsp=lambda d, endpoints=(0, 0): our_tsp.solve_tsp_greedy(d),
        ),
        "tsp_solver.util": _mod("tsp_solver.util", path_cost=our_tsp.path_cost),
        "python_tsp": _mod("python_tsp"),
        "python_tsp.heuristics": _mod(
            "python_tsp.heuristics",
            solve_tsp_local_search=lambda d, x0: our_tsp.solve_tsp_local_search(d, x0),
        ),
        "latent_space": _mod(
            "latent_space", generate_latent_space=generate_latent_space
        ),
        "saliency": _mod("saliency"),
        "train_model": _mod("train_model"),
        "utils": _mod("utils", check_folder=check_folder),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    old_cwd = os.getcwd()
    os.chdir(cwd)  # the module reads ../../../mnt/.../cvds_map.csv at import
    try:
        spec = importlib.util.spec_from_file_location("ref_augmentations", REF_AUG)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        os.chdir(old_cwd)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    mod._results_dir = str(root / "results")
    return mod


def _wav_fixture():
    """Wav names exercising every pairing constraint: repeated names
    (samePCG), multiple dataset letters (sameDataset), 3-char and 2-char
    UMC prefixes, and a CVD map."""
    names = [
        "a0001_0", "a0001_0", "a0002_1", "b0003_2", "b0003_2", "b0004_0",
        "c0005_1", "c0005_1", "d0006_2", "e0007_0", "f0008_1", "f0008_1",
    ]
    diagnoses = ["MVP", "AS", "CAD"]
    cvds = {w: diagnoses[i % 3] for i, w in enumerate(sorted(set(names)))}
    return names, cvds


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(B, C, T)).astype(np.float32)
    lens = rng.integers(20, 80, size=(B, 4))
    frames = np.zeros((B, 5), np.int64)
    frames[:, 1:] = np.cumsum(lens, axis=1)
    # zero tail past the heartbeat (dataset contract)
    for i in range(B):
        data[i, :, frames[i, -1]:] = 0.0
    labels = rng.integers(0, 2, size=B).astype(np.int64)
    wavs, cvds = _wav_fixture()
    return data, frames, labels, wavs, cvds


def run_reference(ref, method, data, frames, labels, wavs, step, np_seed=None):
    args = types.SimpleNamespace(
        method=method, sample_rate=1000, batch_size=B, num_classes=2,
        dataset="PhysioNet"
    )
    if np_seed is not None:
        np.random.seed(np_seed)
    result = ref.augment(
        args,
        torch.from_numpy(data.copy()),
        torch.from_numpy(np.eye(2, dtype=np.float32)[labels]),
        torch.from_numpy(frames.copy()),
        list(wavs),
        types.SimpleNamespace(count=step),
        None,
        torch.device("cpu"),
        ref._results_dir,
    )
    # handlers return (data, target[, mix_indices[, cut]]) with varying arity
    out, t_out = result[0], result[1]
    mix = result[2] if len(result) > 2 else []
    cut = result[3] if len(result) > 3 else None
    return np.asarray(out.detach()), np.asarray(t_out.detach()), np.asarray(mix), cut


def run_ours(method, data, frames, labels, wavs, cvds, step, np_seed=None):
    eng = AugmentEngine(
        AugmentConfig(
            method=method, batch_size=B, num_channels=C, sig_len=T,
            model="resnet9", cvd_map=cvds,
        )
    )
    if np_seed is not None:
        eng.np_stream = np.random.RandomState(np_seed)
    plan = eng.plan(
        step, frames, labels, wavs,
        latent_fn=lambda: _embed(data),
    )
    tohe = np.eye(2, dtype=np.float32)[labels]
    if plan is None:
        return data, tohe, None
    out, t2 = eng.apply(jnp.asarray(data), jnp.asarray(tohe), plan.arrays)
    return np.asarray(out), np.asarray(t2), plan.mix_indices


# methods whose reference handlers are fully deterministic given (step, data)
DISPATCH_METHODS = [
    "durratiomixup",
    "(rand)durratiomixup",
    "(mixAll)durratiomixup",
    "(alpha=0.4)durratiomixup",
    "(samePCG)durratiomixup",
    "(sameDataset)durratiomixup",
    "(sameCVD)durratiomixup",
    "durratiomixup+0.5",
    "durmixmagwarp(0.2,4)",
    "durmixmagwarp(0.3,5)+0.6",
    "(closestknn=2)durratiomixup",
    "(closestbins=3)durratiomixup",
    "durratiocutmix",
    "(rand)durratiocutmix",
    "wav-durratiocutmix",
    "(UMC-subset)durratiocutmix",
    "mixup(same)",
    "mixup(mix)",
    "timemask",
    "timemask(0.3)+0.5",
    "respiratoryscale(10,25)",
    "durmixrespscale",
    "labelcutmix",
    "labelcutmix(smooth)",
    "(rand)labelcutmix",
    "lengthcutmix",
    "lengthcutmix(5bins)",
    "datasetcutmix",
    "wavcutmix",
    "swapsysdia",
    "cont-cutmix",
    "s1s2mask",
    "cutout",
    "cutout(ch)",
    "cutmix",
]

STEPS = [0, 3, 7]


@pytest.mark.parametrize("method", DISPATCH_METHODS)
def test_dispatch_matches_reference(ref, method):
    data, frames, labels, wavs, cvds = _batch(seed=11)
    gated_any = False
    for step in STEPS:
        r_out, r_t, r_mix, _ = run_reference(
            ref, method, data, frames, labels, wavs, step
        )
        o_out, o_t, o_mix = run_ours(
            method, data, frames, labels, wavs, cvds, step
        )
        gated_any = gated_any or o_mix is None
        tol = dict(rtol=1e-4, atol=2e-5) if "magwarp" in method else dict(
            rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            o_out, r_out, err_msg=f"{method} step {step} data", **tol
        )
        np.testing.assert_allclose(
            o_t, r_t, rtol=1e-6, atol=1e-7, err_msg=f"{method} step {step} target"
        )
        if o_mix is not None and np.size(r_mix):
            np.testing.assert_array_equal(
                o_mix, r_mix, err_msg=f"{method} step {step} mix indices"
            )


def test_keepdur_kernel_fuzz_vs_reference(ref):
    """Seeded fuzz: 24 random (shape, frames-geometry, pair, seed) configs
    through mixup_keepdur_multidim_tensors / cutmix_keepdur, including edge
    geometries the fixed-shape tests don't hit — zero-length segments,
    single-sample segments, heartbeats ending exactly at T."""
    rng = np.random.default_rng(2024)
    for trial in range(24):
        c = int(rng.integers(1, 6))
        t = int(rng.integers(64, 512))
        rand_tag = "(rand)" if trial % 3 == 0 else ""
        # segment lengths: allow 0-length and 1-length segments; occasionally
        # force the heartbeat to end exactly at T
        def mk_frames():
            lens = rng.integers(0, max(2, t // 4), size=4)
            f = np.concatenate([[0], np.cumsum(lens)])
            f = np.minimum(f, t)
            if rng.random() < 0.3:
                scale = t / max(f[-1], 1)
                f = np.minimum((f * scale).astype(np.int64), t)
                f.sort()
            return f.astype(np.int64)

        f1, f2 = mk_frames(), mk_frames()
        d1 = rng.normal(size=(c, t)).astype(np.float32)
        d2 = rng.normal(size=(c, t)).astype(np.float32)
        seed = int(rng.integers(0, 10_000))
        for base, method in [("durratiomixup", f"{rand_tag}durratiomixup"),
                             ("durratiocutmix", f"{rand_tag}durratiocutmix")]:
            eng = AugmentEngine(AugmentConfig(
                method=method, batch_size=2, num_channels=c, sig_len=t,
                model="resnet9",
            ))
            frames = np.stack([f1, f2])
            labels = np.zeros(2, np.int64)
            mix = np.array([1, 0])
            if base == "durratiomixup":
                lam = ref.get_lambda(alpha=1, random_seed=seed)
                r = ref.mixup_keepdur_multidim_tensors(
                    torch.from_numpy(d1.copy()), torch.from_numpy(d2.copy()),
                    f1, f2, torch.tensor(np.float32(lam))[None, None],
                    method, seed,
                )
                plan = eng._plan_keepdur_blend(
                    seed, frames, labels, lambda: (mix, None), None
                )
            else:
                r = ref.cutmix_keepdur_multidim_tensors(
                    torch.from_numpy(d1.copy()), torch.from_numpy(d2.copy()),
                    f1, f2, method, seed,
                )
                plan = eng._plan_keepdur_cut(seed, frames, lambda: (mix, None))
            out, _ = eng.apply(
                jnp.asarray(np.stack([d1, d2])),
                jnp.asarray(np.eye(2, dtype=np.float32)[labels]),
                plan.arrays,
            )
            np.testing.assert_allclose(
                np.asarray(out[0]), np.asarray(r), rtol=1e-5, atol=1e-6,
                err_msg=f"trial {trial} {method} c={c} t={t} f1={f1} f2={f2} "
                        f"seed={seed}",
            )


def test_reference_cutmix_ch_is_broken(ref):
    """The reference's 1-D 'cutmix(ch)' branch mutates the batch in place and
    then returns the UNBOUND 'data_new' (augmentations.py:1536-1547, :1567) —
    it crashes on every call.  Our engine implements the evident intent
    (per-channel cut + zeroed tail + per-channel λ mean); this test pins the
    reference bug so the reconstruction is a documented decision."""
    data, frames, labels, wavs, _ = _batch(seed=11)
    with pytest.raises(UnboundLocalError):
        run_reference(ref, "cutmix(ch)", data, frames, labels, wavs, 0)


def _timewarp_ambiguous_mask(knots, T):
    """Queries whose np.interp result is ill-defined: when a time-warp curve
    is locally NON-monotonic, np.interp runs a guess-based binary search over
    unsorted positions (undefined semantics); mask any query t that does not
    have exactly one crossing pos[j] <= t < pos[j+1]."""
    from scipy.interpolate import CubicSpline

    B, K, C = knots.shape
    ws = np.linspace(0, T - 1.0, K)
    mask = np.zeros((B, C, T), bool)
    q = np.arange(T, dtype=np.float64)
    for b in range(B):
        for c in range(C):
            tw = CubicSpline(ws, ws * knots[b, :, c])(q)
            pos = np.clip((T - 1) / tw[-1] * tw, 0, T - 1)
            crossings = ((pos[:-1, None] <= q[None, :]) &
                         (q[None, :] < pos[1:, None])).sum(0)
            mask[b, c] = crossings != 1
    return mask


@pytest.mark.parametrize("method", ["magnitudewarp(0.2,4)", "timewarp(0.1,3)"])
def test_unseeded_np_stream_methods_match(ref, method):
    """magnitudewarp/timewarp draw from the AMBIENT NumPy stream (no
    reseeding, augmentations.py:674-696): sync both sides to the same
    state and compare.  For timewarp, queries inside locally non-monotonic
    warp folds are excluded: np.interp on unsorted positions has
    guess-based (undefined) semantics there — see PARITY.md."""
    data, frames, labels, wavs, cvds = _batch(seed=5)
    for step, np_seed in [(1, 123), (2, 77)]:
        r_out, _, _, _ = run_reference(
            ref, method, data, frames, labels, wavs, step, np_seed=np_seed
        )
        o_out, _, _ = run_ours(
            method, data, frames, labels, wavs, cvds, step, np_seed=np_seed
        )
        if method.startswith("timewarp"):
            knots = np.random.RandomState(np_seed).normal(
                1.0, 0.1, size=(B, 3 + 2, C)
            )
            amb = _timewarp_ambiguous_mask(knots, T)
            assert amb.mean() < 0.05, "ambiguity mask should be rare"
            o_out = np.where(amb, 0.0, o_out)
            r_out = np.where(amb, 0.0, r_out)
        np.testing.assert_allclose(
            o_out, r_out, rtol=2e-4, atol=3e-4,
            err_msg=f"{method} step {step}",
        )


@pytest.mark.parametrize(
    "method",
    ["(saloptenv)durratiomixup", "(saloptsum)durratiomixup",
     "(saloptenv)durmixmagwarp(0.2,4)"],
)
def test_salopt_dispatch_matches_reference(ref, method):
    """The (salopt…) dispatch path (augmentations.py:966-977 →
    mixup_keepdur_multidim_tensors_salopt :210-287) with identical saliency
    maps injected on both sides: reference via the stubbed
    saliency.get_saliency_maps, ours via the engine's saliency_fn hook."""
    data, frames, labels, wavs, cvds = _batch(seed=17)
    rng = np.random.default_rng(99)
    sal = np.abs(rng.normal(size=(B, T))).astype(np.float32)
    for i in range(B):
        sal[i, frames[i, -1]:] = 0.0
    ref.saliency.get_saliency_maps = lambda *a, **k: np.array(sal, copy=True)
    for step in STEPS:
        r_out, r_t, _, _ = run_reference(
            ref, method, data, frames, labels, wavs, step
        )
        eng = AugmentEngine(AugmentConfig(
            method=method, batch_size=B, num_channels=C, sig_len=T,
            model="resnet9",
        ))
        plan = eng.plan(
            step, frames, labels, wavs,
            saliency_fn=lambda mix_model=0: np.array(sal, copy=True),
        )
        tohe = np.eye(2, dtype=np.float32)[labels]
        out, t2 = eng.apply(jnp.asarray(data), jnp.asarray(tohe), plan.arrays)
        tol = dict(rtol=1e-4, atol=2e-5) if "magwarp" in method else dict(
            rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out), r_out, err_msg=f"{method} step {step}", **tol
        )
        np.testing.assert_allclose(np.asarray(t2), r_t, rtol=1e-6, atol=1e-7)


def test_latentmixup_dispatch_matches_reference(ref):
    """latentmixup (augmentations.py:1472-1506): the depth draw
    (randint(1, 3) for resnet9), the split-forward hook, and the latent
    blend — with an identical deterministic 'model' on both sides
    (reference: a callable; ours: the same transform applied to the batch
    before engine.apply, as the trainer's part='first' pass does)."""
    data, frames, labels, wavs, cvds = _batch(seed=53)

    def fake_first(x_np, depth):
        return (x_np * (depth + 0.5)).astype(np.float32)

    def ref_model(d, depth=None, pass_part=None):
        assert pass_part == "first"
        return torch.from_numpy(fake_first(np.asarray(d.detach()), depth))

    args = types.SimpleNamespace(
        method="latentmixup", sample_rate=1000, batch_size=B, num_classes=2,
        dataset="PhysioNet", model="resnet9",
    )
    for step in STEPS:
        result = ref.augment(
            args,
            torch.from_numpy(data.copy()),
            torch.from_numpy(np.eye(2, dtype=np.float32)[labels]),
            torch.from_numpy(frames.copy()),
            list(wavs),
            types.SimpleNamespace(count=step),
            ref_model,
            torch.device("cpu"),
            ref._results_dir,
        )
        r_out, r_t, r_mix = (np.asarray(result[0].detach()),
                             np.asarray(result[1].detach()),
                             np.asarray(result[2]))
        eng = AugmentEngine(AugmentConfig(
            method="latentmixup", batch_size=B, num_channels=C, sig_len=T,
            model="resnet9",
        ))
        plan = eng.plan(step, frames, labels, wavs)
        assert plan.latent_depth == args.depth, f"depth draw at step {step}"
        latent = fake_first(data, plan.latent_depth)
        tohe = np.eye(2, dtype=np.float32)[labels]
        out, t2 = eng.apply(jnp.asarray(latent), jnp.asarray(tohe), plan.arrays)
        np.testing.assert_array_equal(plan.mix_indices, r_mix)
        np.testing.assert_allclose(
            np.asarray(out), r_out, rtol=1e-6, atol=1e-7,
            err_msg=f"latentmixup step {step}",
        )
        np.testing.assert_allclose(np.asarray(t2), r_t, rtol=1e-6, atol=1e-7)


def test_saliency_cutmix_dispatch_matches_reference(ref):
    """The saliency-cutmix bin-splice assembly (augmentations.py:1396-1470):
    quasi-λ bin threshold, S1/S2 most-salient-source rule, concat order,
    per-sample λ target blend — with identical synthetic bin values/frames
    injected on both sides (reference: stubbed saliency.saliency_map; ours:
    the engine's saliency_bins_fn hook)."""
    data, frames, labels, wavs, cvds = _batch(seed=41)
    rng = np.random.default_rng(7)
    nb = 14  # S1:1 + sys:4 + S2:1 + dia:8 (saliency.py:118-130)
    bin_values = rng.uniform(0.0, 1.0, size=(B, nb))
    bin_frames = np.zeros((B, nb + 1), np.int64)
    for i in range(B):
        f = frames[i]
        # reference bin starts: arange(bins)*ceil(L/bins) + seg_start
        # (saliency.py:130,:178-198) — these OVERSHOOT the segment end for
        # short segments, making bin_frames non-monotonic; the handler's
        # np.append slices then clip empty while its λ bookkeeping uses the
        # raw (possibly negative) diffs.  The oracle must exercise that.
        def seg_starts(a, b, bins):
            L = b - a
            return a + np.arange(bins) * int(np.ceil(L / bins))

        bounds = np.concatenate([
            seg_starts(f[0], f[1], 1),
            seg_starts(f[1], f[2], 4),
            seg_starts(f[2], f[3], 1),
            seg_starts(f[3], f[4], 8),
            [f[4]],
        ])
        bin_frames[i] = bounds
    ref.saliency.saliency_map = lambda *a, **k: (
        None, None, None, np.array(bin_values, copy=True),
        np.array(bin_frames, copy=True),
    )
    eng_kw = dict(batch_size=B, num_channels=C, sig_len=T, model="resnet9")
    for step in STEPS:
        r_out, r_t, _, _ = run_reference(
            ref, "saliency-cutmix", data, frames, labels, wavs, step
        )
        eng = AugmentEngine(AugmentConfig(method="saliency-cutmix", **eng_kw))
        plan = eng.plan(
            step, frames, labels, wavs,
            saliency_bins_fn=lambda: (
                np.array(bin_values, copy=True), np.array(bin_frames, copy=True)
            ),
        )
        tohe = np.eye(2, dtype=np.float32)[labels]
        out, t2 = eng.apply(jnp.asarray(data), jnp.asarray(tohe), plan.arrays)
        np.testing.assert_allclose(
            np.asarray(out), r_out, rtol=1e-5, atol=1e-6,
            err_msg=f"saliency-cutmix step {step} data",
        )
        np.testing.assert_allclose(np.asarray(t2), r_t, rtol=1e-6, atol=1e-7)


def test_saliency_cutmix_short_segments_match_reference(ref):
    """Short segments make the reference's overshooting bin starts produce
    NEGATIVE mid-sequence bin diffs (a 5-sample systole with 4 bins); its
    np.append slices clip those to empty for placement while the λ
    bookkeeping keeps the raw diffs — the divergence our consumer must
    mirror (regression)."""
    rng = np.random.default_rng(61)
    data = rng.normal(size=(B, C, T)).astype(np.float32)
    lens = rng.integers(3, 10, size=(B, 4))  # tiny segments incl. sys=5
    lens[0, 1] = 5  # guarantee the L=5/4-bin overshoot case
    frames = np.zeros((B, 5), np.int64)
    frames[:, 1:] = np.cumsum(lens, axis=1)
    for i in range(B):
        data[i, :, frames[i, -1]:] = 0.0
    labels = rng.integers(0, 2, size=B).astype(np.int64)
    wavs = [f"a{i:04d}_0" for i in range(B)]

    def seg_starts(a, b, bins):
        return a + np.arange(bins) * int(np.ceil((b - a) / bins))

    nb = 14
    bin_values = rng.uniform(0.0, 1.0, size=(B, nb))
    bin_frames = np.zeros((B, nb + 1), np.int64)
    for i in range(B):
        f = frames[i]
        bin_frames[i] = np.concatenate([
            seg_starts(f[0], f[1], 1), seg_starts(f[1], f[2], 4),
            seg_starts(f[2], f[3], 1), seg_starts(f[3], f[4], 8), [f[4]],
        ])
    assert (np.diff(bin_frames, axis=1) < 0).any(), "fixture must overshoot"
    ref.saliency.saliency_map = lambda *a, **k: (
        None, None, None, np.array(bin_values, copy=True),
        np.array(bin_frames, copy=True),
    )
    for step in STEPS:
        r_out, r_t, _, _ = run_reference(
            ref, "saliency-cutmix", data, frames, labels, wavs, step
        )
        eng = AugmentEngine(AugmentConfig(
            method="saliency-cutmix", batch_size=B, num_channels=C,
            sig_len=T, model="resnet9",
        ))
        plan = eng.plan(
            step, frames, labels, wavs,
            saliency_bins_fn=lambda: (
                np.array(bin_values, copy=True), np.array(bin_frames, copy=True)
            ),
        )
        tohe = np.eye(2, dtype=np.float32)[labels]
        out, t2 = eng.apply(jnp.asarray(data), jnp.asarray(tohe), plan.arrays)
        np.testing.assert_allclose(
            np.asarray(out), r_out, rtol=1e-5, atol=1e-6,
            err_msg=f"short-segment saliency-cutmix step {step}",
        )
        np.testing.assert_allclose(np.asarray(t2), r_t, rtol=1e-6, atol=1e-7)


def test_lc_nointrusion_dispatch_matches_reference(ref):
    """lc-nointrusion (augmentations.py:1215-1283): 4x candidate-pool
    construction (the three-seed choices/shuffle protocol), cutmix splice,
    and lowest-loss-per-class selection — with an identical deterministic
    scorer injected on both sides (reference: stubbed saliency.saliency_map
    logits + train_model.custom_loss; ours: the same scorer applied to the
    engine's candidate pool before lc_select)."""
    data, frames, labels, wavs, cvds = _batch(seed=47)

    def logits_of(batch_np):
        m = batch_np.mean(axis=(1, 2))
        s = batch_np.std(axis=(1, 2))
        return np.stack([m, s], axis=1)

    def losses_of(out_np, tohe_np):
        return -np.sum(out_np * tohe_np, axis=1)

    ref.saliency.saliency_map = lambda d, t, f, m, dev, *a, **k: (
        None, None, logits_of(np.asarray(d.detach())), None, None
    )
    ref.train_model.custom_loss = lambda out, tohe: (
        None, None, None,
        losses_of(np.asarray(out), np.asarray(tohe.detach())),
    )
    for step in STEPS:
        r_out, r_t, _, _ = run_reference(
            ref, "lc-nointrusion", data, frames, labels, wavs, step
        )
        eng = AugmentEngine(AugmentConfig(
            method="lc-nointrusion", batch_size=B, num_channels=C, sig_len=T,
            model="resnet9",
        ))
        plan = eng.plan(step, frames, labels, wavs)
        tohe = np.eye(2, dtype=np.float32)[labels]
        cands, cand_t = eng.apply(jnp.asarray(data), jnp.asarray(tohe), plan.arrays)
        cands, cand_t = np.asarray(cands), np.asarray(cand_t)
        losses = losses_of(logits_of(cands), cand_t)
        sel = eng.lc_select(
            losses, plan.aux["cand_labels"], plan.aux["n_per_class"]
        )
        np.testing.assert_allclose(
            cands[sel], r_out, rtol=1e-5, atol=1e-6,
            err_msg=f"lc-nointrusion step {step} data",
        )
        np.testing.assert_allclose(cand_t[sel], r_t, rtol=1e-6, atol=1e-7)


def test_pair_selectors_match_reference(ref):
    """Direct comparison of every pair-selector function
    (augmentations.py:500-653) against pcgmix_tpu.augment.pairing."""
    from pcgmix_tpu.augment import pairing

    data, frames, labels, wavs, cvds = _batch(seed=23)
    tohe = torch.from_numpy(np.eye(2, dtype=np.float32)[labels])
    fr = torch.from_numpy(frames)
    for seed in [0, 5, 9]:
        np.testing.assert_array_equal(
            pairing.same_label(labels, seed),
            ref.get_same_label_mix_indices(tohe, seed),
        )
        np.testing.assert_array_equal(
            pairing.same_cvd(wavs, cvds, seed),
            ref.get_same_cvd_mix_indices(wavs, seed),
        )
        np.testing.assert_array_equal(
            pairing.same_wav(wavs, seed),
            ref.get_same_wav_mix_indices(wavs, seed),
        )
        np.testing.assert_array_equal(
            pairing.same_dataset(labels, wavs, seed),
            ref.get_same_dataset_mix_indices(tohe, wavs, seed),
        )
        np.testing.assert_array_equal(
            pairing.same_umc_subset(labels, wavs, seed),
            ref.get_same_umc_subset_mix_indices(tohe, wavs, seed),
        )
        for method, nb in [("lengthcutmix", 0), ("lengthcutmix(5bins)", 5),
                           ("lengthcutmix(10bins)", 10)]:
            np.testing.assert_array_equal(
                pairing.same_length(labels, frames, seed, B, nb),
                ref.get_same_length_mix_indices(tohe, fr, seed, B, method),
            )


def test_keepdur_kernel_matches_reference_directly(ref):
    """mixup_keepdur_multidim_tensors (augmentations.py:289-338) and
    cutmix_keepdur (:340-366) on explicit pairs, incl. the (rand)
    displacement-side rule for positive and negative gaps."""
    data, frames, labels, wavs, cvds = _batch(seed=31)
    tohe = jnp.asarray(np.eye(2, dtype=np.float32)[labels])
    for method in ["durratiomixup", "(rand)durratiomixup"]:
        eng = AugmentEngine(AugmentConfig(
            method=method, batch_size=B, num_channels=C, sig_len=T,
            model="resnet9",
        ))
        for i, j, seed in [(0, 1, 2), (2, 5, 3), (7, 4, 11)]:
            lam = ref.get_lambda(alpha=1, random_seed=seed)
            r = ref.mixup_keepdur_multidim_tensors(
                torch.from_numpy(data[i].copy()), torch.from_numpy(data[j].copy()),
                frames[i], frames[j],
                torch.tensor(np.float32(lam))[None, None], method, seed,
            )
            # inject the explicit pair (i → j) through the plan builder
            mix = np.arange(B)
            mix[i] = j
            plan = eng._plan_keepdur_blend(
                seed, frames, labels, lambda: (mix, None), None
            )
            out, _ = eng.apply(jnp.asarray(data), tohe, plan.arrays)
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(r), rtol=1e-5, atol=1e-6,
                err_msg=f"{method} pair ({i},{j}) seed {seed}",
            )
    # cutmix_keepdur (durratiocutmix kernel), both displacement modes
    for method in ["durratiocutmix", "(rand)durratiocutmix"]:
        eng = AugmentEngine(AugmentConfig(
            method=method, batch_size=B, num_channels=C, sig_len=T,
            model="resnet9",
        ))
        for i, j, seed in [(1, 6, 4), (3, 9, 8)]:
            r = ref.cutmix_keepdur_multidim_tensors(
                torch.from_numpy(data[i].copy()), torch.from_numpy(data[j].copy()),
                frames[i], frames[j], method, seed,
            )
            mix = np.arange(B)
            mix[i] = j
            plan = eng._plan_keepdur_cut(seed, frames, lambda: (mix, None))
            out, _ = eng.apply(jnp.asarray(data), tohe, plan.arrays)
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(r), rtol=1e-5, atol=1e-6,
                err_msg=f"{method} pair ({i},{j}) seed {seed}",
            )
