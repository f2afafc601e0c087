"""Grid-runner gang robustness: sub-gang chunking (--gang-max-size) and
sequential fallback when a gang program fails at runtime
(--no-gang-fallback disables)."""

import glob
import os

import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.exp.runner import run_grid
from pcgmix_tpu.train import TrainConfig
from pcgmix_tpu.train.loop import build_splits

DS = synthetic_physionet_dict(
    num_wavs_train=24, num_wavs_test=6, segments_per_wav=3, sig_len=256, seed=7
)


def _base(root):
    return TrainConfig(
        dataset="PhysioNet", model="resnet9-5k", num_epochs=1, batch_size=16,
        sig_len=256, n_fraction=0.5, op="SGD", experiments_root=str(root),
        loader_parity="numpy", plot=False,
    )


@pytest.fixture(scope="module")
def four_equal_seed_datas():
    sizes: dict = {}
    for i in range(1, 17):
        c = _base("/tmp")
        c.seed_data = 1100000 + i
        tr, _ = build_splits(c, DS)
        sizes.setdefault(len(tr), []).append(1100000 + i)
    groups = [v for v in sizes.values() if len(v) >= 4]
    assert groups, "no 4-member equal-sized group in probe range"
    return groups[0][:4]


def test_gang_max_size_chunks_groups(tmp_path, capsys, four_equal_seed_datas):
    ran = run_grid(
        _base(tmp_path), DS, ["durratiomixup"], [0.5], [1],
        seed_datas=four_equal_seed_datas, robust=False, gang=True,
        gang_max_size=2, progress=True,
    )
    out = capsys.readouterr().out
    assert out.count("gang of 2:") == 2  # 4 members → two sub-gangs
    assert "gang of 4" not in out
    assert len(ran) == 4
    done = glob.glob(os.path.join(str(tmp_path), "*", "performance.pkl"))
    assert len(done) == 4


def test_estimate_gang_max_size_formula():
    """Pin the memory-derived default cap (VERDICT r3 item 8): S_max =
    (hbm × safety − corpus) // (state + reuse × jaxpr-intermediate sum),
    with exact param/opt-state sizing via eval_shape."""
    import jax
    import numpy as np

    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.gang import (
        _jaxpr_intermediate_bytes, _tree_bytes, estimate_gang_max_size,
    )

    cfg = _base("/tmp")  # resnet9-5k, batch 16, sig_len 256, SGD
    train_size = 48
    # independent re-derivation of the state term
    model = build_model(cfg.model, cfg.dataset, 2, train=True)
    variables = jax.eval_shape(
        lambda s: model.init(jax.random.PRNGKey(0), s),
        jax.ShapeDtypeStruct((16, 4, 256), np.float32),
    )
    state = _tree_bytes(variables) * 2 + train_size * 2 * 4  # SGD: 1 copy
    s_max = estimate_gang_max_size(
        cfg, train_size, corpus_bytes=0, hbm_bytes=64 * 1024**2
    )
    # monotone + formula checks without re-tracing the activation term:
    # solve the activation bytes back out of one call, then pin a second
    # budget against the same components
    budget1 = 64 * 1024**2 * 0.8
    per_member = budget1 // s_max  # within one member of the true value
    assert per_member > state  # activations contribute
    s_max_2x = estimate_gang_max_size(
        cfg, train_size, corpus_bytes=0, hbm_bytes=128 * 1024**2
    )
    assert s_max <= s_max_2x <= 2 * s_max + 2  # ~linear in the budget
    # corpus bytes come off the top
    s_max_c = estimate_gang_max_size(
        cfg, train_size, corpus_bytes=32 * 1024**2, hbm_bytes=64 * 1024**2
    )
    assert s_max_c < s_max
    # floor at 1 even when the budget is hopeless
    assert estimate_gang_max_size(cfg, train_size, hbm_bytes=1024) == 1
    # the activation term is a real jaxpr sum, not a constant
    def f(x):
        return (x * 2.0 + 1.0).sum()

    jx = jax.make_jaxpr(f)(np.zeros((8, 8), np.float32))
    assert _jaxpr_intermediate_bytes(jx.jaxpr) >= 2 * 8 * 8 * 4


def test_gang_auto_size_chunks_on_tiny_budget(
    tmp_path, capsys, four_equal_seed_datas, monkeypatch
):
    """gang_max_size=None derives the cap from device memory; with the
    estimator forced to 2, a 4-member grid chunks into two sub-gangs
    automatically (VERDICT r3 item 8 'oversized grids chunk automatically
    on the dryrun mesh')."""
    import pcgmix_tpu.train.gang as gang_mod

    monkeypatch.setattr(
        gang_mod, "estimate_gang_max_size", lambda *a, **k: 2
    )
    ran = run_grid(
        _base(tmp_path), DS, ["durratiomixup"], [0.5], [1],
        seed_datas=four_equal_seed_datas, robust=False, gang=True,
        gang_max_size=None, progress=True,
    )
    out = capsys.readouterr().out
    assert "gang auto-size: S_max=2" in out
    assert out.count("gang of 2:") == 2
    assert len(ran) == 4


def test_gang_runtime_failure_falls_back_sequential(
    tmp_path, capsys, four_equal_seed_datas, monkeypatch
):
    """A gang program that dies at runtime (e.g. device OOM at an ambitious
    member count) must not abort the grid: members re-run sequentially and
    every run dir still lands."""
    import pcgmix_tpu.train.gang as gang_mod

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: simulated device OOM")

    monkeypatch.setattr(gang_mod, "train_gang", boom)
    sds = four_equal_seed_datas[:2]
    ran = run_grid(
        _base(tmp_path), DS, ["durratiomixup"], [0.5], [1],
        seed_datas=sds, robust=False, gang=True, progress=True,
    )
    out = capsys.readouterr().out
    assert "FAILED" in out and "falling back to sequential" in out
    assert len(ran) == 2
    done = glob.glob(os.path.join(str(tmp_path), "*", "performance.pkl"))
    assert len(done) == 2


def test_no_gang_fallback_surfaces_failure(
    tmp_path, four_equal_seed_datas, monkeypatch
):
    import pcgmix_tpu.train.gang as gang_mod

    def boom(*a, **k):
        raise RuntimeError("simulated device OOM")

    monkeypatch.setattr(gang_mod, "train_gang", boom)
    with pytest.raises(RuntimeError, match="simulated device OOM"):
        run_grid(
            _base(tmp_path), DS, ["durratiomixup"], [0.5], [1],
            seed_datas=four_equal_seed_datas[:2], robust=False, gang=True,
            gang_fallback=False, progress=False,
        )


def test_gang_profitable_heuristic():
    """gang_profitable: chip-measured crossover (BENCH.md gang tables) —
    sub-1M-param models (Potes 130k, resnet9-5k 3k) gang profitably, the
    6M-param resnet9 does not; threshold is overridable."""
    from pcgmix_tpu.train.gang import gang_profitable

    small = _base("/tmp")  # resnet9-5k
    assert gang_profitable(small)
    potes = _base("/tmp")
    potes.model = "Potes"
    assert gang_profitable(potes)
    big = _base("/tmp")
    big.model = "resnet9"
    assert not gang_profitable(big)
    assert gang_profitable(big, param_threshold=10_000_000)


def test_gang_advisory_printed_for_big_model(
    tmp_path, capsys, four_equal_seed_datas, monkeypatch
):
    """The runner prints the profitability advisory once per model when
    ganging an MXU-saturating model, and still gangs."""
    import pcgmix_tpu.train.gang as gang_mod

    monkeypatch.setattr(gang_mod, "gang_profitable", lambda *a, **k: False)
    ran = run_grid(
        _base(tmp_path), DS, ["durratiomixup"], [0.5], [1],
        seed_datas=four_equal_seed_datas, robust=False, gang=True,
        gang_max_size=0, progress=True,
    )
    out = capsys.readouterr().out
    assert out.count("gang advisory:") == 1
    assert "gang of 4" in out
    assert len(ran) == 4


def test_estimate_gang_max_size_dropout_and_spec_shapes():
    """Regressions: (a) dropout models (the Potes family) must trace — the
    estimator's train-mode apply needs a 'dropout' rng stream; (b) the
    spectrogram sample shape comes from the caller (sample_shape), not from
    sig_len, which spec configs keep at its 1-D meaning."""
    from pcgmix_tpu.train.gang import estimate_gang_max_size

    potes = TrainConfig(dataset="PhysioNet", model="Potes", batch_size=64,
                        sig_len=2500)
    s = estimate_gang_max_size(potes, train_size=2000,
                               hbm_bytes=16 * 1024**3)
    assert s >= 8, s  # 130k params: big gangs fit

    spec = TrainConfig(dataset="PhysioNet(spec128)", model="resnet9",
                       batch_size=16)
    # must not trace a (16, 1, 2500, 2500) monster; runs in milliseconds
    # and returns a sane floor with the REAL 128x128 row shape
    s128 = estimate_gang_max_size(spec, train_size=500,
                                  hbm_bytes=64 * 1024**3,
                                  sample_shape=(1, 128, 128))
    assert s128 >= 1
