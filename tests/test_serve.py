"""Serving path: checkpoint → batched inference → recording decisions."""

import os

import numpy as np
import pytest

from pcgmix_tpu.data import physionet_split, synthetic_physionet_dict
from pcgmix_tpu.exp import experiment_dir
from pcgmix_tpu.serve import Classifier
from pcgmix_tpu.train import TrainConfig, train_model


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=10, segments_per_wav=3, sig_len=512,
        seed=8,
    )
    cfg = TrainConfig(
        model="resnet9-5k", method="base", num_epochs=6, batch_size=16,
        sig_len=512, experiments_root=root, loader_parity="numpy", plot=False,
    )
    train_model(cfg, ds)
    return cfg, ds


def test_classifier_roundtrip(trained):
    cfg, ds = trained
    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    clf = Classifier.from_checkpoint(
        ckpt, "resnet9-5k", sig_len=512, batch_size=32
    )
    test = physionet_split(ds, "test")
    probs = clf.predict_proba(test.data)
    assert probs.shape == (len(test), 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
    preds = clf.predict_recordings(test.data, test.wav)
    assert len(preds) == len(set(test.wav))
    by_wav = {w: int(t) for w, t in zip(test.wav, test.label)}
    acc = np.mean([p.pred == by_wav[p.wav] for p in preds]) * 100
    assert acc >= 70.0  # the trained model generalizes on the synthetic task


def test_export_artifact_roundtrip(trained, tmp_path):
    """StableHLO artifact (jax.export, weights baked in) reproduces the live
    jitted forward without model code or checkpoint access."""
    cfg, ds = trained
    from pcgmix_tpu.serve import ExportedClassifier

    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    clf = Classifier.from_checkpoint(
        ckpt, "resnet9-5k", sig_len=512, batch_size=32
    )
    path = str(tmp_path / "model.pcgx")
    header = clf.export_artifact(path, (4, 512), model_name="resnet9-5k")
    assert header["batch_size"] == 32
    assert header["input_shape"] == [4, 512]
    assert header["num_classes"] == 2
    assert header["platforms"]  # current backend recorded

    served = ExportedClassifier(path)
    assert served.batch_size == 32 and served.input_shape == (4, 512)
    test = physionet_split(ds, "test")
    live = clf.predict_proba(test.data)
    exported = served.predict_proba(test.data)
    np.testing.assert_allclose(exported, live, rtol=0, atol=1e-6)
    preds = served.predict_recordings(test.data, test.wav)
    assert len(preds) == len(set(test.wav))

    bad = tmp_path / "not_artifact.pcgx"
    bad.write_bytes(b"NOTMAGIC" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not a pcgmix serving artifact"):
        ExportedClassifier(str(bad))

    # every malformed-file shape raises the module's ValueError contract
    trunc = tmp_path / "trunc.pcgx"
    trunc.write_bytes(b"PCGXSHLO" + b"\x02")  # magic + short length field
    with pytest.raises(ValueError, match="truncated serving artifact"):
        ExportedClassifier(str(trunc))
    short = tmp_path / "short.pcgx"
    short.write_bytes(b"PCGXSHLO" + (99).to_bytes(4, "little") + b"{}")
    with pytest.raises(ValueError, match="truncated serving artifact"):
        ExportedClassifier(str(short))
    corrupt = tmp_path / "corrupt.pcgx"
    corrupt.write_bytes(b"PCGXSHLO" + (4).to_bytes(4, "little") + b"\xff\xfe{!")
    with pytest.raises(ValueError, match="corrupt serving artifact header"):
        ExportedClassifier(str(corrupt))

    # wrong-shaped data fails with the header shapes, not an XLA error
    with pytest.raises(ValueError, match=r"\(4, 512\)"):
        served.predict_proba(np.zeros((3, 1, 128, 128), np.float32))

    # class-majority: header default, constructor override
    assert served.class_majority is False
    assert ExportedClassifier(path, class_majority=True).class_majority is True


def test_export_artifact_multiplatform(trained, tmp_path):
    """platforms=("cpu","tpu") produces one artifact lowered for both
    backends; the cpu lane still matches the live forward here."""
    cfg, ds = trained
    from pcgmix_tpu.serve import ExportedClassifier

    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    clf = Classifier.from_checkpoint(
        ckpt, "resnet9-5k", sig_len=512, batch_size=16
    )
    path = str(tmp_path / "model_xplat.pcgx")
    header = clf.export_artifact(
        path, (4, 512), platforms=("cpu", "tpu"), model_name="resnet9-5k"
    )
    assert sorted(header["platforms"]) == ["cpu", "tpu"]
    served = ExportedClassifier(path)
    test = physionet_split(ds, "test")
    np.testing.assert_allclose(
        served.predict_proba(test.data[:20]),
        clf.predict_proba(test.data[:20]),
        rtol=0, atol=1e-6,
    )


def test_export_artifact_2d(tmp_path):
    """The 2-D (spectrogram) model exports and serves through the same
    artifact path; shape validation uses the (1, S, S) header shape."""
    import jax

    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.serve import ExportedClassifier

    model = build_model("resnet9", "UMC(spec64)", train=False)
    x = np.zeros((1, 1, 64, 64), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    clf = Classifier(
        model, variables["params"], variables.get("batch_stats", {}),
        batch_size=8,
    )
    path = str(tmp_path / "spec.pcgx")
    header = clf.export_artifact(path, (1, 64, 64), model_name="resnet9")
    assert header["input_shape"] == [1, 64, 64]
    served = ExportedClassifier(path)
    data = np.random.RandomState(0).randn(11, 1, 64, 64).astype(np.float32)
    np.testing.assert_allclose(
        served.predict_proba(data), clf.predict_proba(data), rtol=0, atol=1e-6
    )
    with pytest.raises(ValueError, match=r"\(1, 64, 64\)"):
        served.predict_proba(np.zeros((2, 4, 512), np.float32))


def test_serve_cli_artifact(trained, tmp_path, capsys):
    """CLI --export-to writes an artifact; CLI --artifact serves from it."""
    cfg, ds = trained
    from pcgmix_tpu import serve, utils

    path = str(tmp_path / "d.dat")
    utils.dict2file(ds, path)
    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    art = str(tmp_path / "model.pcgx")
    serve.main([
        "--checkpoint", ckpt, "--model", "resnet9-5k", "--sig-len", "512",
        "--batch-size", "32", "--export-to", art,
    ])
    out = capsys.readouterr().out
    assert "# exported" in out and os.path.exists(art)

    serve.main([
        "--artifact", art, "--dataset-file", path, "--split", "test",
    ])
    out = capsys.readouterr().out
    assert "p_abnormal=" in out and "recording accuracy" in out


def test_serve_cli(trained, tmp_path, capsys):
    cfg, ds = trained
    from pcgmix_tpu import serve, utils

    path = str(tmp_path / "d.dat")
    utils.dict2file(ds, path)
    ckpt = os.path.join(experiment_dir(cfg), "model.msgpack")
    serve.main([
        "--checkpoint", ckpt, "--model", "resnet9-5k",
        "--dataset-file", path, "--split", "test",
    ])
    out = capsys.readouterr().out
    assert "p_abnormal=" in out and "recording accuracy" in out
