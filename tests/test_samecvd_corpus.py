"""(sameCVD) end-to-end from a corpus-resident cvds_map.csv — closes the
last coverage long-tail (ROADMAP.md): the reference hardwires the csv path
into its corpus data root and reads it at import time (augmentations.py:26-28);
here the same csv travels corpus tree → builder CLI → runner CLI
(--cvd-map-csv) → the (sameCVD) pairing constraint inside the engine."""

import glob
import os

import pytest

from pcgmix_tpu.data import builder
from pcgmix_tpu.data.datasets import load_cvd_map
from pcgmix_tpu.utils import file2dict

from .test_corpus import build_fake_physionet_tree


@pytest.fixture(scope="module")
def corpus_chain(tmp_path_factory):
    root = build_fake_physionet_tree(str(tmp_path_factory.mktemp("cvd_corpus")))
    dat = str(tmp_path_factory.mktemp("cvd_built") / "phys1d.dat")
    builder.main(["--corpus", "physionet-1d", "--root", root, "--out", dat])
    return root, dat


def test_corpus_tree_ships_cvds_map(corpus_chain):
    """The fixture tree carries cvds_map.csv in the reference's contract
    (columns wav,diagnosis) covering every recording in the corpus."""
    root, dat = corpus_chain
    m = load_cvd_map(os.path.join(root, "cvds_map.csv"))
    wavs = set(file2dict(dat)["train"]["wav"]) | set(
        file2dict(dat)["test"]["wav"]
    )
    assert wavs and wavs <= set(m), f"unmapped wavs: {wavs - set(m)}"
    assert set(m.values()) == {"CAD", "MVP"}


def test_samecvd_grid_from_corpus_cvds_map(corpus_chain, tmp_path):
    """Runner CLI trains a (sameCVD) method with --cvd-map-csv pointing at
    the corpus-resident csv; the run completes under the reference's done
    convention (performance.pkl, utils.py:26-32)."""
    from pcgmix_tpu.exp import runner

    root, dat = corpus_chain
    exp_root = str(tmp_path / "runs")
    runner.main([
        "--dataset-file", dat, "--experiments-root", exp_root,
        "--model", "resnet9-5k", "--methods", "(sameCVD)durratiomixup",
        "--n-fractions", "1.0", "--seeds", "1", "--seed-datas", "1100001",
        "--num-epochs", "1", "--batch-size", "8", "--no-robust",
        "--cvd-map-csv", os.path.join(root, "cvds_map.csv"),
    ])
    done = glob.glob(os.path.join(exp_root, "*sameCVD*", "performance.pkl"))
    assert len(done) == 1
