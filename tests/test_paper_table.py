"""Paper-table assembly (results_final_full.ipynb cells 4/17):
propagate_error / relative_improvement_over_vanilla / paper_table."""

import math
import os

import numpy as np
import pytest

from pcgmix_tpu import utils
from pcgmix_tpu.exp import experiment_dir
from pcgmix_tpu.exp.paper import (
    paper_table,
    propagate_error,
    relative_improvement_over_vanilla,
)
from pcgmix_tpu.train import TrainConfig


def test_propagate_error_formula():
    """Exact cell-4 quotient-error formula: sqrt((da/a)^2 + (db/b)^2)."""
    a, da, b, db = 92.0, 1.5, 90.0, 2.0
    assert propagate_error(a, da, b, db) == pytest.approx(
        math.sqrt((da / a) ** 2 + (db / b) ** 2)
    )
    # vectorized over grids
    out = propagate_error(
        np.array([[92.0, 80.0]]), np.array([[1.5, 1.0]]),
        np.array([[90.0, 78.0]]), np.array([[2.0, 0.5]]),
    )
    assert out.shape == (1, 2)


def test_relative_improvement_over_vanilla():
    """Row 0 is the vanilla baseline (left NaN, as the notebook leaves it
    blank); method rows get (a/b-1)*100 ± propagated sd, rounded to 2 dp."""
    mean = np.array([[90.0, 80.0], [92.0, np.nan]])
    std = np.array([[2.0, 1.0], [1.5, np.nan]])
    ri_m, ri_s = relative_improvement_over_vanilla(mean, std)
    assert np.isnan(ri_m[0]).all() and np.isnan(ri_s[0]).all()
    a, da, b, db = 92.0, 1.5, 90.0, 2.0
    assert ri_m[1, 0] == pytest.approx(round((a / b - 1) * 100, 2))
    re = math.sqrt((da / a) ** 2 + (db / b) ** 2)
    assert ri_s[1, 0] == pytest.approx(round(re * a / b * 100, 2))
    # NaN inputs stay NaN, no warnings-to-errors blowups
    assert math.isnan(ri_m[1, 1]) and math.isnan(ri_s[1, 1])

    with pytest.raises(ValueError, match="2-D"):
        relative_improvement_over_vanilla(np.zeros(3), np.zeros(3))


def _fabricate_run(cfg, acc: float) -> None:
    """Write just enough of a finished run dir (model.msgpack done-marker +
    performance.pkl) for the results reader to pick it up."""
    d = experiment_dir(cfg)
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, "model.msgpack"), "wb").close()
    utils.save_dict(
        {"test_accuracy": [acc - 1.0, acc]}, os.path.join(d, "performance.pkl")
    )


def test_paper_table_from_run_dirs(tmp_path):
    """End-to-end: fabricated finished runs -> melted published table with
    acc ± sd, relative improvement over the vanilla row, '-' for missing
    cells, and the notebook's display renames."""
    import copy

    template = TrainConfig(
        model="resnet9-5k", method="base", num_epochs=2, batch_size=8,
        sig_len=512, experiments_root=str(tmp_path), loader_parity="numpy",
    )
    # at n_fraction 1.0 the 1-D grid is seed_data 1100001, seeds 1..5:
    # fabricate two seeds per method so std is well-defined
    accs = {"base": (90.0, 92.0), "durratiomixup": (93.0, 95.0)}
    for method, vals in accs.items():
        for seed, acc in zip((1, 2), vals):
            run = copy.deepcopy(template)
            run.method, run.seed, run.seed_data = method, seed, 1100001
            run.n_fraction = 1.0
            _fabricate_run(run, acc)

    df = paper_table(
        {"resnet": template},
        methods=["base", "durratiomixup"],
        n_fractions=[1.0, 0.1],
        method_labels=["Vanilla", "PCGmix"],
        robust=False,
        adsi_by_model={"resnet": np.array([[np.nan, np.nan], [1.23, np.nan]])},
    )
    assert list(df.columns) == ["N frac", "Method", "resnet acc", "resnet ri",
                                "resnet adsi"]
    # notebook melt order: n_fraction outer, method inner; display renames on
    assert df["Method"].tolist() == [
        "Vanilla (no aug.)", "PCGmix (ours)"] * 2
    van = df.iloc[0]
    assert van["resnet acc"] == "91.00 ± 1.00"  # mean/std over the 2 seeds
    assert van["resnet ri"] == "-"  # vanilla row blank
    pcg = df.iloc[1]
    assert pcg["resnet acc"] == "94.00 ± 1.00"
    a, da, b, db = 94.0, 1.0, 91.0, 1.0
    ri = round((a / b - 1) * 100, 2)
    ris = round(math.sqrt((da / a) ** 2 + (db / b) ** 2) * a / b * 100, 2)
    assert pcg["resnet ri"] == f"{ri:.2f} ± {ris:.2f}"
    assert pcg["resnet adsi"] == "1.23"
    # the unpopulated 0.1 column renders '-'
    assert set(df.iloc[2][["resnet acc", "resnet ri", "resnet adsi"]]) == {"-"}


def test_export_all_seeds_csvs_roundtrip(tmp_path):
    """The exported {dataset}_{model}_all_seeds_{metric}-{mean,std}.csv
    grids load through the reference notebook's EXACT read pattern
    (results_final_full.ipynb cell 4: read_csv →
    set_index('Method').loc[custom_order] → columns indexed by str(n_frac))
    and feed its relative_improv_over_vanilla unchanged."""
    import copy

    import pandas as pd

    from pcgmix_tpu.exp.paper import export_all_seeds_csvs

    template = TrainConfig(
        model="resnet9-5k", method="base", num_epochs=2, batch_size=8,
        sig_len=512, experiments_root=str(tmp_path), loader_parity="numpy",
    )
    accs = {"base": (90.0, 92.0), "durratiomixup": (93.0, 95.0)}
    for method, vals in accs.items():
        for seed, acc in zip((1, 2), vals):
            run = copy.deepcopy(template)
            run.method, run.seed, run.seed_data = method, seed, 1100001
            run.n_fraction = 1.0
            _fabricate_run(run, acc)

    out = tmp_path / "csvs"
    out.mkdir()
    paths = export_all_seeds_csvs(
        template, ["base", "durratiomixup"], [1.0, 0.1],
        out_dir=str(out), robust=False, method_labels=["Vanilla", "PCGmix"],
    )
    assert [os.path.basename(p) for p in paths] == [
        "PhysioNet_resnet9-5k_all_seeds_Accuracy-mean.csv",
        "PhysioNet_resnet9-5k_all_seeds_Accuracy-std.csv",
    ]
    # --- the notebook's cell-4 consumption, verbatim semantics ---
    custom_order = ["Vanilla", "PCGmix"]
    acc_mean = pd.read_csv(paths[0])
    acc_mean = acc_mean.set_index("Method").loc[custom_order].reset_index()
    acc_std = pd.read_csv(paths[1])
    acc_std = acc_std.set_index("Method").loc[custom_order].reset_index()
    n_fracs = [str(x) for x in [1.0, 0.1]]
    assert acc_mean.loc[0, "1.0"] == pytest.approx(91.0)
    assert acc_mean.loc[1, "1.0"] == pytest.approx(94.0)
    assert acc_std.loc[1, "1.0"] == pytest.approx(1.0)
    assert math.isnan(acc_mean.loc[0, "0.1"])  # no runs -> NaN cell
    # cell-4 relative improvement over the vanilla row works off the frames
    a, b = acc_mean.loc[1, "1.0"], acc_mean.loc[0, "1.0"]
    assert round((a / b - 1) * 100, 2) == pytest.approx(3.3)
