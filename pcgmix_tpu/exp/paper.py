"""Headline paper-table assembly (results_final_full.ipynb cells 4/17).

The reference's final-results notebook reads pre-aggregated
``*_all_seeds_Accuracy-{mean,std}.csv`` grids (method rows x n_fraction
columns), computes each method's relative improvement over the vanilla row
with propagated error (``propagate_error`` / ``relative_improv_over_vanilla``,
results_final_full.ipynb cell 4), melts everything per model, and joins the
columns into the published table layout
``N frac | Method | <model> acc | <model> ri | <model> adsi | ...``.

Here the aggregation feeds directly from finished run dirs
(exp.results.read_experiments_all_dataseeds) instead of intermediate CSVs,
so one call goes run-dirs -> paper table.  The ADSI column has **no
producer anywhere in the reference code** (only the external
``*_all_seeds_adsi.csv`` artifacts are read), so it is accepted as an
optional caller-supplied grid and rendered '-' when absent.

Reference quirk NOT reproduced: cell 4 assigns ``ri_std.loc[i, nf] =
{np.round(...)}`` — a Python *set* wrapping the float, which later
stringifies as ``'{0.5}'`` in the joined column.  We store the float.
"""

from __future__ import annotations

import copy
import math
from typing import Mapping, Sequence

import numpy as np

from pcgmix_tpu.exp.results import read_experiments_all_dataseeds

#: the published method order (results_final_full.ipynb cell 4
#: ``custom_order``) and the display renames applied to the final table.
PAPER_METHOD_ORDER = (
    "Vanilla", "NoiseInject", "TimeMask", "MagWarp", "RespScale",
    "Mixup", "ManifoldMixup", "PCGmix", "PCGmix+",
)
PAPER_METHOD_RENAMES = {
    "Vanilla": "Vanilla (no aug.)",
    "PCGmix": "PCGmix (ours)",
    "PCGmix+": "PCGmix+ (ours)",
}


def propagate_error(a, da, b, db):
    """Relative error of the quotient c = a/b from the relative errors of a
    and b (results_final_full.ipynb cell 4): sqrt((da/a)^2 + (db/b)^2)."""
    a, da, b, db = (np.asarray(x, np.float64) for x in (a, da, b, db))
    return np.sqrt((da / a) ** 2 + (db / b) ** 2)


def relative_improvement_over_vanilla(
    mean: np.ndarray, std: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-cell relative improvement (%) of each method row over the vanilla
    row, with propagated standard deviation
    (``relative_improv_over_vanilla``, results_final_full.ipynb cell 4).

    mean/std: (n_methods, n_fractions) grids whose ROW 0 is the vanilla
    baseline.  Returns (ri_mean, ri_std), NaN on row 0 (the notebook leaves
    the vanilla row blank) and wherever either input is NaN.  Values are
    rounded to 2 decimals exactly as the notebook rounds them.
    """
    mean = np.asarray(mean, np.float64)
    std = np.asarray(std, np.float64)
    if mean.shape != std.shape or mean.ndim != 2:
        raise ValueError(f"mean/std must be equal 2-D grids, got {mean.shape} vs {std.shape}")
    ri_mean = np.full(mean.shape, np.nan)
    ri_std = np.full(mean.shape, np.nan)
    b, db = mean[0], std[0]
    with np.errstate(invalid="ignore", divide="ignore"):
        for i in range(1, len(mean)):
            a, da = mean[i], std[i]
            re = propagate_error(a, da, b, db)
            ri_mean[i] = np.round((a / b - 1.0) * 100.0, 2)
            ri_std[i] = np.round(re * a / b * 100.0, 2)
    return ri_mean, ri_std


def method_grid(
    cfg,
    methods: Sequence[str],
    n_fractions: Sequence[float],
    metric: str = "Accuracy",
    robust: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """(n_methods, n_fractions) mean/std grids over the published seed grids
    — the run-dir-fed equivalent of the notebook's
    ``*_all_seeds_{metric}-{mean,std}.csv`` inputs.  NaN where no finished
    run exists."""
    shape = (len(methods), len(n_fractions))
    mean = np.full(shape, np.nan)
    std = np.full(shape, np.nan)
    for i, method in enumerate(methods):
        run = copy.deepcopy(cfg)
        run.method = method
        res = read_experiments_all_dataseeds(run, n_fractions, metric, robust=robust)
        for j, nf in enumerate(n_fractions):
            if nf in res.n_fractions:
                k = res.n_fractions.index(nf)
                mean[i, j] = res.mean[k]
                std[i, j] = res.std[k]
    return mean, std


def export_all_seeds_csvs(
    cfg,
    methods: Sequence[str],
    n_fractions: Sequence[float],
    metric: str = "Accuracy",
    out_dir: str = ".",
    robust: bool = True,
    method_labels: Sequence[str] | None = None,
    grid: tuple[np.ndarray, np.ndarray] | None = None,
) -> list[str]:
    """Write the ``{dataset}_{model}_all_seeds_{metric}-{mean,std}.csv``
    artifacts that results_final_full.ipynb cells 4/17 read (columns
    ``Method, <str(n_frac)>, ...``; Method holds the display labels the
    notebook indexes by, e.g. ``custom_order``).  The reference repo ships
    no producer for these files — the authors assembled them by hand from
    read_experiments output; this generates them straight from finished run
    dirs so the unmodified reference notebook can be fed from this
    framework's experiments.  Returns the two paths (mean first).

    ``grid``: optional precomputed ``method_grid`` result (mean, std) —
    pass it when the caller already aggregated the same run dirs (e.g.
    for a paper_table) to avoid re-reading every performance.pkl."""
    import os

    import pandas as pd

    labels = list(method_labels) if method_labels is not None else list(methods)
    if len(labels) != len(methods):
        raise ValueError("method_labels must align 1:1 with methods")
    os.makedirs(out_dir, exist_ok=True)
    mean, std = grid if grid is not None else method_grid(
        cfg, methods, n_fractions, metric, robust)
    cols = [str(x) for x in n_fractions]
    paths = []
    for arr, kind in ((mean, "mean"), (std, "std")):
        df = pd.DataFrame(arr, columns=cols)
        df.insert(0, "Method", labels)
        path = os.path.join(
            out_dir, f"{cfg.dataset}_{cfg.model}_all_seeds_{metric}-{kind}.csv")
        df.to_csv(path, index=False)
        paths.append(path)
    return paths


def _pm(m: float, s: float) -> str:
    # the notebook replaces 'nan \pm nan' cells with '-'
    if math.isnan(m) or math.isnan(s):
        return "-"
    return f"{m:.2f} ± {s:.2f}"


def paper_table(
    cfg_by_model: Mapping[str, object],
    methods: Sequence[str],
    n_fractions: Sequence[float],
    metric: str = "Accuracy",
    robust: bool = True,
    method_labels: Sequence[str] | None = None,
    adsi_by_model: Mapping[str, np.ndarray] | None = None,
    grids_by_model: Mapping[str, tuple] | None = None,
):
    """Assemble the published headline table (results_final_full.ipynb
    cells 4/17) straight from finished run dirs.

    cfg_by_model: display name -> TrainConfig template (e.g.
    ``{"Potes": cfg_potes, "resnet": cfg_resnet}``; the notebook's two-model
    PhysioNet table).  ``methods[0]`` must be the vanilla baseline.
    ``method_labels`` gives display names per method string (default: the
    strings themselves); ``PAPER_METHOD_RENAMES`` is applied on top.
    ``adsi_by_model`` optionally supplies the externally produced ADSI grids
    ((n_methods, n_fractions), same row/column order).  ``grids_by_model``
    optionally supplies precomputed ``method_grid`` (mean, std) tuples per
    model so the run dirs are read once across table + CSV export.

    Returns a pandas DataFrame melted in the notebook's order (n_fraction
    outer, method inner) with columns
    ``N frac, Method, <model> acc, <model> ri[, <model> adsi] ...``.
    """
    import pandas as pd

    labels = list(method_labels) if method_labels is not None else list(methods)
    if len(labels) != len(methods):
        raise ValueError("method_labels must align 1:1 with methods")
    per_model = {}
    for model, cfg in cfg_by_model.items():
        if grids_by_model is not None and model in grids_by_model:
            mean, std = grids_by_model[model]
        else:
            mean, std = method_grid(cfg, methods, n_fractions, metric, robust)
        ri_m, ri_s = relative_improvement_over_vanilla(mean, std)
        per_model[model] = (mean, std, ri_m, ri_s)
    rows = []
    for j, nf in enumerate(n_fractions):
        for i, lab in enumerate(labels):
            row = {"N frac": nf, "Method": PAPER_METHOD_RENAMES.get(lab, lab)}
            for model, (mean, std, ri_m, ri_s) in per_model.items():
                row[f"{model} acc"] = _pm(mean[i, j], std[i, j])
                row[f"{model} ri"] = _pm(ri_m[i, j], ri_s[i, j])
                if adsi_by_model is not None and model in adsi_by_model:
                    v = float(np.asarray(adsi_by_model[model])[i, j])
                    row[f"{model} adsi"] = "-" if math.isnan(v) else f"{v:.2f}"
            rows.append(row)
    return pd.DataFrame(rows)
