"""Classical pipeline stages: segment pruning, aggregation, sklearn bench.

Parity targets: remove_segments_meanEnvelope (classical.py:115-146),
get_mean_and_SD_of_seg_features_window (classical.py:165-200),
aggregate_features_into_rec_mean_and_sd_single_vector (classical.py:202-243),
search_space_grid (classical.py:1320-1388), run_experiment
(classical.py:1391-1617).  XGBoost/LightGBM are not installed in this image
and are skipped with a note (the reference itself skips LGBM,
classical.py:1535-1536).
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import numpy as np
import pandas as pd

NON_FEATURES = ["class", "wav", "segment", "sig_qual", "split"]


def export_nfrac_wav_subsets(
    dataset: dict,
    out_dir: str,
    n_fractions: Sequence[float],
    seed_datas_by_nfrac: Optional[dict] = None,
    dataset_name: str = "PhysioNet",
) -> list[str]:
    """Write the per-(seed_data, n_fraction) train-wav subset files the
    classical experiments consume (classical.ipynb cell 21; read back at
    classical.py:1424-1428).  For each grid point, two files:

      {dataset}_seed(data)={sd}_nfrac={nf}_valid=False.txt      (sorted wavs)
      {dataset}_seed(data)={sd}_nfrac={nf}_valid=False_num-segs.txt

    plus a {dataset}_test.txt with the held-out recordings.  Existing files
    are skipped (the cell's resume behavior).  seed_datas_by_nfrac defaults
    to the published grids (exp.robust.SEED_DATA_GRIDS).  Returns the paths
    written."""
    import os

    from pcgmix_tpu.data import physionet_split

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for nf in n_fractions:
        if seed_datas_by_nfrac and nf in seed_datas_by_nfrac:
            sds = seed_datas_by_nfrac[nf]
        else:
            from pcgmix_tpu.exp.robust import SEED_DATA_GRIDS

            sds = SEED_DATA_GRIDS[nf][0] if nf in SEED_DATA_GRIDS else [1100001]
        for sd in sds:
            stem = f"{dataset_name}_seed(data)={sd}_nfrac={nf}_valid=False"
            fn = os.path.join(out_dir, stem + ".txt")
            fn2 = os.path.join(out_dir, stem + "_num-segs.txt")
            if os.path.exists(fn) and os.path.exists(fn2):
                continue
            split = physionet_split(
                dataset, "train", n_fraction=nf, seed_data=sd,
                train_balance=True,
            )
            np.savetxt(fn, sorted(set(split.wav)), fmt="%s")
            np.savetxt(fn2, [len(split)])
            written += [fn, fn2]
    test_fn = os.path.join(out_dir, f"{dataset_name}_test.txt")
    if not os.path.exists(test_fn):
        test = physionet_split(dataset, "test")
        np.savetxt(test_fn, sorted(set(test.wav)), fmt="%s")
        written.append(test_fn)
    return written


def collect_augmentation_features(run_dir: str) -> pd.DataFrame:
    """Concatenate a run's per-step classical_space/train_{i}.csv dumps in
    step order into one table (classical.ipynb cell 27)."""
    import glob
    import os

    cs = os.path.join(run_dir, "classical_space")
    number = len(glob.glob(os.path.join(cs, "train_*.csv")))
    frames = [
        pd.read_csv(os.path.join(cs, f"train_{i}.csv")) for i in range(number)
    ]
    return (
        pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    )


def merge_augmentation_features(
    run_dir: str,
    base_features: pd.DataFrame,
    out_dir: str,
    tag: str,
    steps_per_epoch: int = 2,
    band_suffix: str = "filtBandIIR(ZP)4-25-400_normRMS",
    swap_base_labels: bool = True,
) -> list[str]:
    """Fold a run's augmented-instance feature dumps into a base feature
    table, writing one cumulative snapshot per epoch (classical.ipynb cell
    25).  Munging per batch, matching the cell: drop sig_qual/split, rename
    wav → recording with the band-filename suffix, derive recordingName /
    patientID, segment=999; the base table gets the UMC label swap
    (``class`` 0↔1, as the loader applies it) and rows sort by
    (recording, segment).  ``steps_per_epoch`` generalizes the cell's
    hardcoded ``i%2==1`` (batch_size=512 → two batches per epoch).
    Returns the snapshot paths (part=0 is the base alone)."""
    import glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    base = base_features.copy()
    if swap_base_labels:
        base["class"] = base["class"].replace({0: 1, 1: 0})
    base.sort_values(by=["recording", "segment"], inplace=True)
    fts = base
    written = []
    fn = os.path.join(out_dir, f"UMC_augmentation_fts_{tag}_part=0.csv")
    fts.to_csv(fn, index=False)
    written.append(fn)
    cs = os.path.join(run_dir, "classical_space")
    number = len(glob.glob(os.path.join(cs, "train_*.csv")))
    for i in range(number):
        batch = pd.read_csv(os.path.join(cs, f"train_{i}.csv"))
        batch = batch.drop(columns=["sig_qual", "split"])
        batch = batch.rename(columns={"wav": "recording"})
        batch["recording"] = batch["recording"].apply(
            lambda x: f"{x}_{band_suffix}"
        )
        batch["recordingName"] = batch["recording"].apply(lambda x: f"{x}.wav")
        batch["patientID"] = batch["recording"].apply(
            lambda x: f"ID_{x.split('_')[0]}"
        )
        batch["segment"] = 999
        fts = pd.concat([fts, batch], ignore_index=True)
        fts.sort_values(by=["recording", "segment"], inplace=True)
        if i % steps_per_epoch == steps_per_epoch - 1:
            part = (i + 1) // steps_per_epoch
            fn = os.path.join(
                out_dir, f"UMC_augmentation_fts_{tag}_part={part}.csv"
            )
            fts.to_csv(fn, index=False)
            written.append(fn)
    return written


def remove_segments_mean_envelope(
    features: pd.DataFrame, std_factor: float = 1.4
) -> pd.DataFrame:
    """Drop segments whose MeanEnv_RR lies outside mean ± SD·std_factor of
    their recording (classical.py:115-146)."""
    kept = []
    for rec in features["wav"].unique():
        rows = features[features["wav"] == rec]
        mu = rows["MeanEnv_RR"].mean()
        sd = rows["MeanEnv_RR"].std()
        mask = (rows["MeanEnv_RR"] < mu - sd * std_factor) | (
            rows["MeanEnv_RR"] > mu + sd * std_factor
        )
        kept.append(rows[~mask])
    return pd.concat(kept).reset_index(drop=True)


def _clean_recording(rows: pd.DataFrame) -> pd.DataFrame:
    num_cols = [c for c in rows.columns if c not in NON_FEATURES]
    rows = rows.copy()
    cleaned = rows[num_cols].replace([-np.inf, np.inf], np.nan)
    rows[num_cols] = cleaned.fillna(cleaned.mean())
    return rows.astype({"segment": int}).sort_values(by="segment")


def aggregate_features_rolling(
    features: pd.DataFrame, window: int = 2
) -> pd.DataFrame:
    """Append cyclic rolling-window mean (m_) and SD (sd_) columns per
    recording (classical.py:165-200): each recording's rows are tiled so the
    window wraps around the cycle sequence."""
    cols = [c for c in features.columns if c not in NON_FEATURES]
    out = []
    for rec in features["wav"].unique():
        rows = _clean_recording(features[features["wav"] == rec])
        n = len(rows)
        mult = int(np.ceil((n + window) / n))
        tiled = pd.concat([rows] * mult)
        roll = tiled[cols].rolling(window=window)
        m = roll.mean().add_prefix("m_")
        sd = roll.std().add_prefix("sd_")
        out.append(pd.concat([tiled, m, sd], axis=1).iloc[-n:])
    return pd.concat(out).reset_index(drop=True)


def aggregate_features_single(features: pd.DataFrame) -> pd.DataFrame:
    """One row per recording with whole-recording m_/sd_ aggregates
    (classical.py:202-243)."""
    cols = [c for c in features.columns if c not in NON_FEATURES]
    out = []
    for rec in features["wav"].unique():
        rows = _clean_recording(features[features["wav"] == rec])
        m = rows[cols].mean().add_prefix("m_")
        sd = rows[cols].std().add_prefix("sd_")
        head = rows.head(1).reset_index(drop=True)
        out.append(pd.concat([head, m.to_frame().T, sd.to_frame().T], axis=1))
    return pd.concat(out).reset_index(drop=True)


def mean_confidence_interval(data, confidence: float = 0.95):
    """(mean, low, high) t-interval (classical.py:1295-1300)."""
    import scipy.stats

    a = 1.0 * np.asarray(data)
    m, se = np.mean(a), scipy.stats.sem(a)
    h = se * scipy.stats.t.ppf((1 + confidence) / 2.0, len(a) - 1)
    return m, m - h, m + h


def mean_sd_95ci(data) -> str:
    """'mean (SD; low-high)' summary string (classical.py:1303-1309)."""
    m, lo, hi = mean_confidence_interval(data)
    return f"{np.mean(data):.5f} ({np.std(data):.2f}; {lo:.2f}-{hi:.2f})"


def generate_ncv_folds(wavs, fold_number: int = 5, seed: int = 4):
    """Seeded shuffled interleaved CV partitions over recordings
    (classical.py:1312-1317)."""
    import random

    wavs = list(wavs)
    random.Random(seed).shuffle(wavs)
    return [wavs[i::fold_number] for i in range(fold_number)]


def search_space_grid(clf_name: str, seed: int) -> dict:
    """Hyperparameter grids for fine-tuning (classical.py:1320-1388)."""
    grids = {
        "LogisticRegression": dict(
            solver=["newton-cg", "lbfgs", "liblinear"],
            penalty=["none", "l1", "l2", "elasticnet"],
            C=np.linspace(0.05, 2, 40), max_iter=[50, 100, 150, 200],
            random_state=[seed],
        ),
        "DecisionTreeClassifier": dict(
            criterion=["gini", "entropy"], splitter=["best", "random"],
            min_samples_split=list(range(4, 91, 6)),
            max_features=["sqrt", "log2"], random_state=[seed],
        ),
        "RandomForestClassifier": dict(
            n_estimators=[20, 80, 140, 200], criterion=["gini", "entropy"],
            min_samples_split=list(range(4, 91, 6)),
            max_features=["sqrt", "log2"], random_state=[seed],
        ),
        "KNeighborsClassifier": dict(
            n_neighbors=[3, 9, 15, 21, 27, 37, 43, 49, 55, 61, 67, 73, 79,
                         85, 91, 97, 1],
            weights=["uniform", "distance"],
            metric=["euclidean", "manhattan", "minkowski"],
        ),
        "GaussianNB": dict(var_smoothing=np.logspace(0, -9, num=100)),
        "SVC": dict(
            svc__C=np.linspace(0.05, 3, 60),
            svc__kernel=["linear", "poly", "rbf", "sigmoid"],
            svc__gamma=["auto"], svc__probability=[True],
            svc__random_state=[seed],
        ),
        "SGDClassifier": dict(
            loss=["log_loss"], penalty=["l2", "l1", "elasticnet"],
            alpha=np.logspace(0, -9, num=100), random_state=[seed],
        ),
        "GradientBoostingClassifier": dict(
            learning_rate=[0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2],
            n_estimators=[20, 60, 100, 140, 180, 200],
            min_samples_split=np.linspace(0.1, 0.5, 12),
            max_features=["sqrt", "log2"], random_state=[seed],
        ),
    }
    return grids.get(clf_name, {})


def _make_classifiers(seed: int):
    from sklearn.ensemble import GradientBoostingClassifier, RandomForestClassifier
    from sklearn.linear_model import LogisticRegression, SGDClassifier
    from sklearn.naive_bayes import GaussianNB
    from sklearn.neighbors import KNeighborsClassifier
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC
    from sklearn.tree import DecisionTreeClassifier

    clfs = [
        (LogisticRegression(random_state=seed), "LogisticRegression", "LR"),
        (DecisionTreeClassifier(random_state=seed), "DecisionTreeClassifier", "DT"),
        (RandomForestClassifier(random_state=seed), "RandomForestClassifier", "RF"),
        (KNeighborsClassifier(), "KNeighborsClassifier", "KN"),
        (GaussianNB(), "GaussianNB", "GNB"),
        (
            make_pipeline(
                StandardScaler(), SVC(probability=True, gamma="auto", random_state=seed)
            ),
            "SVC",
            "SVC",
        ),
        (SGDClassifier(loss="log_loss", random_state=seed), "SGDClassifier", "SGD"),
        (
            GradientBoostingClassifier(random_state=seed),
            "GradientBoostingClassifier",
            "GB",
        ),
    ]
    # XGBoost / LightGBM join the bench only when their wheels exist
    # (the reference includes them, classical.py:1460-1471, but itself skips
    # LGBM at run time, classical.py:1535-1536).
    try:
        from xgboost.sklearn import XGBClassifier

        clfs.append((XGBClassifier(verbosity=0, seed=seed), "XGBClassifier", "XGB"))
    except ImportError:
        pass
    return clfs


def run_experiment(
    features: pd.DataFrame,
    *,
    keep_only_sd_m_fts: bool = True,
    majority_vote_prediction: bool = True,
    train_wavs: Optional[Sequence[str]] = None,
    kb_num: int = 40,
    seed: int = 4,
) -> pd.DataFrame:
    """Train/test bench over the classifier zoo (classical.py:1391-1617).

    features: the aggregated feature table with NON_FEATURES columns.
    train_wavs: optional recording subset matching the NN experiment's
    n_fraction selection (classical.py:1424-1428).
    Returns one metrics row per classifier.
    """
    from sklearn.feature_selection import mutual_info_classif
    from sklearn.metrics import (
        accuracy_score,
        confusion_matrix,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    np.random.seed(seed)
    fts = features.copy()
    if train_wavs is not None:
        fts = fts[
            (fts["split"] == "test")
            | ((fts["split"] == "train") & fts.wav.isin(set(train_wavs)))
        ]
    if keep_only_sd_m_fts:
        # the reference's feature filter (classical.py:1438-1448): keep m_/sd_
        # aggregates, drop RR-derived, MaxAmp, EnvInt, dwt5, chroma, mel
        sel = [c for c in fts.columns if c.startswith(("m_", "sd_"))]
        sel = [c for c in sel if "_RR" not in c and "MaxAmp" not in c
               and "EnvInt" not in c and "dwt5" not in c and "chroma" not in c
               and "melspectrogram1" not in c]
        fts = fts[sel + NON_FEATURES]
    if fts.isna().any().any():
        fts = fts.fillna(0)

    train = fts[fts["split"] == "train"]
    x_train_full = train.drop(columns=NON_FEATURES)
    y_train = train["class"].to_numpy().astype(int)
    # mutual-information top-k feature selection (classical.py:1504-1511)
    mi = mutual_info_classif(x_train_full, y_train, random_state=seed)
    order = pd.DataFrame({"features": x_train_full.columns, "MI": mi})
    order = order.sort_values("MI", ascending=False)
    selected = list(order["features"].head(kb_num).values)

    results = []
    test = fts[fts["split"] == "test"]
    x_tr = train[selected].to_numpy()
    x_te = test[selected].to_numpy()
    y_te_seg = test["class"].to_numpy().astype(int)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for clf, clf_name, abbrv in _make_classifiers(seed):
            y_te = y_te_seg
            clf.fit(x_tr, y_train)
            pred = clf.predict(x_te)
            proba = clf.predict_proba(x_te)
            if majority_vote_prediction:
                # mean per-recording probabilities (classical.py:1561-1578)
                df = pd.DataFrame(
                    {"rec": test["wav"].to_numpy(), "y": y_te,
                     "p0": proba[:, 0], "p1": proba[:, 1]}
                )
                agg = df.groupby("rec", sort=False).mean()
                y_te = agg["y"].to_numpy().astype(int)
                proba1 = agg["p1"].to_numpy()
                pred = (agg[["p0", "p1"]].to_numpy().argmax(axis=1)).astype(int)
            else:
                proba1 = proba[:, 1]
            tn, fp, fn, tp = confusion_matrix(y_te, pred, labels=[0, 1]).ravel()
            results.append(
                {
                    "Classifier": abbrv,
                    "Specificity": tn / max(tn + fp, 1),
                    "Sensitivity": tp / max(tp + fn, 1),
                    "Accuracy": accuracy_score(y_te, pred),
                    "Precision": precision_score(y_te, pred, zero_division=0),
                    "Recall": recall_score(y_te, pred, zero_division=0),
                    "F1": f1_score(y_te, pred, zero_division=0),
                    "ROCAUC": roc_auc_score(y_te, proba1)
                    if len(np.unique(y_te)) > 1
                    else np.nan,
                }
            )
    return pd.DataFrame(results)
