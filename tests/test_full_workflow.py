"""The complete switch-over user workflow in one chain — raw corpus tree →
builder CLI → runner grid CLI (+ resume skip) → results CLI (incl. the
paper table) → serving artifact — mirroring the reference's published flow
(databuilder.ipynb → train_model.py grids → read_experiments.py →
results_final_full.ipynb), which has no single driver; every hop here is
the installed CLI surface, not library internals."""

import glob
import os

import numpy as np
import pytest

from pcgmix_tpu.data import builder
from pcgmix_tpu.data.physionet import physionet_split
from pcgmix_tpu.utils import file2dict

from .test_corpus import build_fake_physionet_tree

RUN_FLAGS = [
    "--model", "resnet9-5k", "--methods", "base", "durratiomixup",
    "--n-fractions", "1.0", "--seeds", "1", "--seed-datas", "1100001",
    "--num-epochs", "2", "--batch-size", "8", "--no-robust",
]


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """corpus tree → pcgmix-build → pcgmix-run grid; returns the paths."""
    from pcgmix_tpu.exp import runner

    corpus_root = build_fake_physionet_tree(
        str(tmp_path_factory.mktemp("wf_corpus"))
    )
    dat = str(tmp_path_factory.mktemp("wf_built") / "phys1d.dat")
    builder.main([
        "--corpus", "physionet-1d", "--root", corpus_root, "--out", dat,
    ])
    exp_root = str(tmp_path_factory.mktemp("wf_runs"))
    runner.main([
        "--dataset-file", dat, "--experiments-root", exp_root, *RUN_FLAGS,
    ])
    return dat, exp_root


def test_runner_wrote_both_run_dirs(chain):
    """Both grid cells finished per the reference's done convention
    (performance.pkl present — utils.py:26-32)."""
    dat, exp_root = chain
    done = sorted(glob.glob(os.path.join(exp_root, "*", "performance.pkl")))
    assert len(done) == 2
    names = [os.path.basename(os.path.dirname(p)) for p in done]
    assert any("_base_" in n for n in names)
    assert any("_durratiomixup_" in n for n in names)
    for p in done:
        assert os.path.exists(
            os.path.join(os.path.dirname(p), "model.msgpack")
        )


def test_runner_resume_skips_finished(chain, capsys):
    """Re-running the identical grid must skip every finished dir — the
    reference's resume contract (utils.experiment_dir + done files)."""
    from pcgmix_tpu.exp import runner

    dat, exp_root = chain
    runner.main([
        "--dataset-file", dat, "--experiments-root", exp_root, *RUN_FLAGS,
    ])
    out = capsys.readouterr().out
    assert out.count("skip (done)") == 2


def test_results_cli_reads_the_grid(chain, capsys):
    from pcgmix_tpu.exp import results

    _, exp_root = chain
    results.main([
        "--experiments-root", exp_root, "--model", "resnet9-5k",
        "--methods", "base", "durratiomixup", "--n-fractions", "1.0",
        "--num-epochs", "2", "--batch-size", "8", "--no-robust",
    ])
    out = capsys.readouterr().out
    assert "base" in out and "durratiomixup" in out
    # one mean±SD cell per method (single-seed grid → SD 0.0)
    assert out.count("±") >= 2


def test_results_cli_paper_mode(chain, capsys, tmp_path):
    """--paper emits the melted paper table (relative improvement over the
    first method) and --export-csv writes the notebook-input grids."""
    from pcgmix_tpu.exp import results

    _, exp_root = chain
    csv_dir = str(tmp_path / "csvs")
    results.main([
        "--experiments-root", exp_root, "--model", "resnet9-5k",
        "--methods", "base", "durratiomixup", "--n-fractions", "1.0",
        "--num-epochs", "2", "--batch-size", "8", "--no-robust", "--paper",
        "--method-labels", "Vanilla", "PCGmix", "--export-csv", csv_dir,
    ])
    out = capsys.readouterr().out
    assert "Vanilla" in out and "PCGmix" in out
    written = glob.glob(os.path.join(csv_dir, "*.csv"))
    assert len(written) >= 2  # mean + std grids


def test_trained_checkpoint_serves_via_artifact(chain, tmp_path):
    """The grid's trained checkpoint exports to a StableHLO artifact that
    classifies the corpus-built test split end to end."""
    from pcgmix_tpu.serve import Classifier, ExportedClassifier

    dat, exp_root = chain
    ckpts = sorted(glob.glob(os.path.join(exp_root, "*_durratiomixup_*",
                                          "model.msgpack")))
    assert len(ckpts) == 1
    clf = Classifier.from_checkpoint(
        ckpts[0], "resnet9-5k", sig_len=2500, batch_size=16
    )
    art = str(tmp_path / "wf.pcgx")
    clf.export_artifact(art, (4, 2500), model_name="resnet9-5k")
    served = ExportedClassifier(art)
    test = physionet_split(file2dict(dat), "test")
    preds = served.predict_recordings(test.data, test.wav)
    assert len(preds) == len(set(test.wav))
    probs = served.predict_proba(test.data)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
