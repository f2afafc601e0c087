"""Classical subsystem tests: DSP primitives, feature vector, pipeline."""

import numpy as np
import pandas as pd
import pytest

from pcgmix_tpu.classical import (
    aggregate_features_rolling,
    aggregate_features_single,
    extract_features,
    feature_vector_seg,
    remove_segments_mean_envelope,
    run_experiment,
)
from pcgmix_tpu.classical import dsp
from pcgmix_tpu.data import synthetic_physionet_dict


def test_zero_crossings():
    y = np.array([1.0, -1.0, 1.0, 1.0, -0.5])
    assert dsp.zero_crossings(y) == 3
    assert dsp.zero_crossings(np.ones(10)) == 0


def test_rms_constant_signal():
    y = np.full(512, 2.0)
    r = dsp.rms(y, 256, 64)
    # interior frames see only the constant
    assert np.isclose(r[2:-2], 2.0).all()


def test_spectral_centroid_tone():
    t = np.arange(1000) / 1000.0
    y = np.sin(2 * np.pi * 125 * t)
    c = dsp.spectral_centroid(y, 1000, 256, 64)
    assert abs(np.median(c) - 125) < 15


def test_spectral_rolloff_bounds():
    rngv = np.random.default_rng(0).normal(size=600)
    r = dsp.spectral_rolloff(rngv, 1000, 256, 64)
    assert np.all(r >= 0) and np.all(r <= 500)


def test_sample_entropy_regular_vs_random():
    t = np.arange(400)
    regular = np.sin(2 * np.pi * t / 50)
    noise = np.random.default_rng(0).normal(size=400)
    se_reg = dsp.sample_entropy(regular)
    se_noise = dsp.sample_entropy(noise)
    assert se_reg < se_noise


def test_wavedec_db4_matches_structure():
    y = np.random.default_rng(0).normal(size=500)
    coeffs = dsp.wavedec_db4(y, level=5)
    assert len(coeffs) == 6  # cA5, cD5..cD1
    # pywt length recurrence: floor((n + flen - 1) / 2) per level
    n, flen = 500, 8
    lens = []
    for _ in range(5):
        n = (n + flen - 1) // 2
        lens.append(n)
    assert [len(c) for c in coeffs] == [lens[-1]] + lens[::-1]
    # energy is approximately preserved (symmetric padding adds boundary
    # energy, so Parseval holds only approximately)
    total = sum(float(np.sum(c**2)) for c in coeffs)
    assert abs(total - float(np.sum(y**2))) / float(np.sum(y**2)) < 0.15
    # db4 annihilates constants: details vanish, approximation scales by √2
    # per level
    const = np.ones(512)
    c2 = dsp.wavedec_db4(const, level=3)
    for d in c2[1:]:
        assert np.max(np.abs(d)) < 1e-8
    assert np.allclose(c2[0], 2 ** 1.5, atol=1e-8)


def test_mfcc_shape():
    y = np.random.default_rng(0).normal(size=700)
    m = dsp.mfcc(y, 1000, 256, 64)
    assert m.shape[0] == 13


@pytest.fixture(scope="module")
def feature_table():
    ds = synthetic_physionet_dict(
        num_wavs_train=6, num_wavs_test=4, segments_per_wav=3, sig_len=2500, seed=2
    )
    return extract_features(ds)


def test_feature_vector_names_and_count(feature_table):
    fts = feature_table
    assert len(fts) == 30
    # the reference's marquee feature groups are all present
    for name in ("BPM", "Dur_Ratio_SysDia", "MaxAmp_Ratio_S1S2", "MeanEnv_RR",
                 "PSD_Sys_25_40Hz", "ZC_Dia", "mfcc13_Dia", "RMS_Ratio_S1S2",
                 "Skewness_Sys", "Kurtosis_RR", "SpecCentroid_S1",
                 "SpecContrast5_Dia", "SpecFlatness_S2", "SpecRolloff_Sys",
                 "PolyFeatures_RR", "SE_Sys", "dwt1_Dia", "chroma_stft1_RR",
                 "melspectrogram1_S1"):
        assert name in fts.columns, name
    n_numeric = len([c for c in fts.columns if c not in
                     ("class", "wav", "segment", "sig_qual", "split")])
    assert n_numeric > 200  # ~230 per-segment features


def test_pipeline_end_to_end(feature_table):
    pruned = remove_segments_mean_envelope(feature_table, std_factor=1.4)
    assert len(pruned) <= len(feature_table)
    agg = aggregate_features_rolling(pruned, window=2)
    assert any(c.startswith("m_") for c in agg.columns)
    assert any(c.startswith("sd_") for c in agg.columns)
    assert len(agg) == len(pruned)
    results = run_experiment(agg, kb_num=20, seed=4)
    assert {"Classifier", "Accuracy", "ROCAUC"} <= set(results.columns)
    assert len(results) >= 7
    assert results["Accuracy"].between(0, 1).all()


def test_aggregate_single(feature_table):
    single = aggregate_features_single(feature_table)
    assert len(single) == feature_table["wav"].nunique()


def test_cli_end_to_end(tmp_path):
    """python -m pcgmix_tpu.classical: extract → prune → aggregate → bench,
    artifact writing, and the features.csv resume contract."""
    from pcgmix_tpu import utils
    from pcgmix_tpu.classical.__main__ import main

    ds = synthetic_physionet_dict(
        num_wavs_train=6, num_wavs_test=4, segments_per_wav=2, sig_len=600,
        seed=3,
    )
    dat = tmp_path / "d.dat"
    out = tmp_path / "out"
    utils.dict2file(ds, str(dat))
    assert main(["--dataset-file", str(dat), "--out-dir", str(out),
                 "--kb-num", "10"]) == 0
    for f in ("features.csv", "aggregated.csv", "results.csv"):
        assert (out / f).exists(), f
    results = pd.read_csv(out / "results.csv")
    assert len(results) >= 7 and results["Accuracy"].between(0, 1).all()
    # resume: mutate features.csv, re-run, and confirm it was used as-is
    feats = pd.read_csv(out / "features.csv")
    feats["BPM"] = 0.0
    feats.to_csv(out / "features.csv", index=False)
    assert main(["--dataset-file", str(dat), "--out-dir", str(out),
                 "--kb-num", "10"]) == 0
    assert (pd.read_csv(out / "features.csv")["BPM"] == 0).all()


def test_wav_subset_export_and_train_wavs(tmp_path):
    """classical.ipynb cell 21: export the per-(seed_data, n_fraction)
    train-wav subset files, then feed one back through --train-wavs so the
    bench trains on exactly that subset (classical.py:1424-1428)."""
    import numpy as np

    from pcgmix_tpu import utils
    from pcgmix_tpu.classical import export_nfrac_wav_subsets, run_experiment
    from pcgmix_tpu.classical.__main__ import main
    from pcgmix_tpu.data import physionet_split

    ds = synthetic_physionet_dict(
        num_wavs_train=12, num_wavs_test=4, segments_per_wav=2, sig_len=600,
        seed=5,
    )
    out = tmp_path / "subsets"
    paths = export_nfrac_wav_subsets(
        ds, str(out), [0.5], seed_datas_by_nfrac={0.5: [7, 8]}
    )
    assert len(paths) == 5  # 2 grid points x 2 files + the test list
    fn = out / "PhysioNet_seed(data)=7_nfrac=0.5_valid=False.txt"
    wavs = [ln.strip() for ln in open(fn)]
    split = physionet_split(ds, "train", n_fraction=0.5, seed_data=7)
    assert wavs == sorted(set(split.wav))
    n_segs = int(np.loadtxt(out / "PhysioNet_seed(data)=7_nfrac=0.5_valid=False_num-segs.txt"))
    assert n_segs == len(split)
    # idempotent: a second export writes nothing new
    assert export_nfrac_wav_subsets(
        ds, str(out), [0.5], seed_datas_by_nfrac={0.5: [7, 8]}
    ) == []

    # --export-subsets CLI mode
    dat = tmp_path / "d.dat"
    utils.dict2file(ds, str(dat))
    out2 = tmp_path / "subsets_cli"
    assert main(["--dataset-file", str(dat), "--out-dir", str(out2),
                 "--export-subsets", "1.0"]) == 0
    assert (out2 / "PhysioNet_seed(data)=1100001_nfrac=1.0_valid=False.txt").exists()

    # train_wavs restricts the bench's train rows to the subset
    feats = pd.DataFrame({
        "class": [0, 1] * 8,
        "wav": [f"a{i:02d}" for i in range(8) for _ in (0, 1)],
        "segment": [999] * 16,
        "sig_qual": [1] * 16,
        "split": ["train"] * 12 + ["test"] * 4,
        "m_f1": np.linspace(0, 1, 16),
        "sd_f1": np.linspace(1, 0, 16),
    })
    res_all = run_experiment(feats, kb_num=2, majority_vote_prediction=False)
    res_sub = run_experiment(
        feats, kb_num=2, majority_vote_prediction=False,
        train_wavs=["a00", "a01", "a02"],
    )
    assert len(res_all) == len(res_sub)  # same classifier zoo, fewer rows


def test_augmentation_feature_collectors(tmp_path):
    """classical.ipynb cells 25/27: concatenate a run's classical_space
    dumps (cell 27) and fold them into a base feature table with the cell's
    exact munging — label-swapped base, wav→recording with band suffix,
    recordingName/patientID, segment=999, one cumulative snapshot per
    epoch (cell 25)."""
    import numpy as np

    from pcgmix_tpu.classical import (
        collect_augmentation_features,
        merge_augmentation_features,
    )

    cs = tmp_path / "classical_space"
    cs.mkdir()
    for i in range(4):
        pd.DataFrame({
            "class": [0, 1], "wav": [f"r{i}a", f"r{i}b"], "segment": [0, 1],
            "sig_qual": [1, 1], "split": ["train"] * 2,
            "m_f1": [0.1 * i, 0.2 * i],
        }).to_csv(cs / f"train_{i}.csv", index=False)

    # a stray file in the dump dir must not break the contiguous-index scan
    (cs / "notes.txt").write_text("junk")
    allf = collect_augmentation_features(str(tmp_path))
    assert len(allf) == 8 and "sig_qual" in allf.columns  # cell 27: raw concat

    base = pd.DataFrame({
        "class": [0, 1],
        "recording": ["x_filtBandIIR(ZP)4-25-400_normRMS"] * 2,
        "segment": [0, 1], "m_f1": [0.5, 0.6],
    })
    out = tmp_path / "merged"
    paths = merge_augmentation_features(
        str(tmp_path), base, str(out), "durratiomixup+1.0_seed_data=1"
    )
    # part=0 is the base alone; 4 batches at 2 steps/epoch -> parts 1, 2
    assert [p.rsplit("part=", 1)[1] for p in paths] == ["0.csv", "1.csv", "2.csv"]
    part0 = pd.read_csv(paths[0])
    assert list(part0["class"]) == [1, 0]  # UMC label swap on the base
    last = pd.read_csv(paths[-1])
    assert (last["segment"] == 999).sum() == 8
    assert "sig_qual" not in last.columns and "split" not in last.columns
    aug_rows = last[last["segment"] == 999]
    assert aug_rows["recording"].str.endswith("_filtBandIIR(ZP)4-25-400_normRMS").all()
    assert (aug_rows["recordingName"] == aug_rows["recording"] + ".wav").all()
    assert aug_rows["patientID"].str.startswith("ID_").all()
    # the original base df is untouched (copy semantics)
    assert list(base["class"]) == [0, 1]


def test_cli_partial_checkpoint_requires_explicit_resume(tmp_path):
    """A crashed extraction's features.partial.csv must not be silently
    benchmarked; the CLI demands --start-counter (or deletion)."""
    from pcgmix_tpu import utils
    from pcgmix_tpu.classical.__main__ import main

    ds = synthetic_physionet_dict(
        num_wavs_train=4, num_wavs_test=2, segments_per_wav=2, sig_len=600,
        seed=5,
    )
    dat = tmp_path / "d.dat"
    out = tmp_path / "out"
    out.mkdir()
    utils.dict2file(ds, str(dat))
    wav0 = ds["train"]["wav"][0]
    (out / "features.partial.csv").write_text(
        f"BPM,wav,segment,split\n1.0,{wav0},0,train\n"
    )
    with pytest.raises(SystemExit, match="partial extraction"):
        main(["--dataset-file", str(dat), "--out-dir", str(out)])
    # resuming from the counter merges (the stale duplicate row is replaced
    # by the re-extracted one) and completes
    assert main(["--dataset-file", str(dat), "--out-dir", str(out),
                 "--start-counter", "1", "--kb-num", "5"]) == 0
    feats = pd.read_csv(out / "features.csv")
    assert ((feats["wav"] == wav0) & (feats["segment"] == 0)
            & (feats["split"] == "train")).sum() == 1
    assert not (out / "features.partial.csv").exists()
