"""Offline databuilder tests on synthetic raw recordings."""

import numpy as np
import pytest

from pcgmix_tpu.data.builder import (
    build_1d_dataset,
    build_spectrogram_dataset,
    parse_state_sequence,
    parse_umc_state_trace,
    slice_cycles,
)
from pcgmix_tpu.utils import dict2file, file2dict


def test_parse_state_sequence_complete_cycles():
    states = ["diastole", "S1", "systole", "S2", "diastole", "S1", "systole",
              "S2", "diastole", "S1"]
    frames = np.array([0, 100, 150, 300, 360, 900, 1000, 1250, 1310, 1800])
    cycles = parse_state_sequence(frames, states)
    assert len(cycles) == 2
    np.testing.assert_array_equal(cycles[0], [100, 150, 300, 360, 900])
    np.testing.assert_array_equal(cycles[1], [900, 1000, 1250, 1310, 1800])


def test_parse_state_sequence_noise_semantics():
    """Reference cell-25 scan: only the 4 cycle states are checked for the
    noise marker, so a cycle whose *closing* boundary is the start of a
    noise run is KEPT (its end frame is the noise start), while a cycle
    containing 'N' among its 4 states is skipped."""
    states = ["S1", "systole", "S2", "diastole", "N", "S1", "systole", "S2",
              "diastole", "S1"]
    frames = np.arange(10) * 100
    cycles = parse_state_sequence(frames, states)
    assert len(cycles) == 2
    np.testing.assert_array_equal(cycles[0], [0, 100, 200, 300, 400])
    np.testing.assert_array_equal(cycles[1], [500, 600, 700, 800, 900])

    # noise *inside* the window: the S1 at 0 has 'N' among its 4 states
    states2 = ["S1", "systole", "N", "S2", "diastole", "S1", "systole", "S2",
               "diastole", "S1"]
    cycles2 = parse_state_sequence(np.arange(10) * 100, states2)
    assert len(cycles2) == 1
    np.testing.assert_array_equal(cycles2[0], [500, 600, 700, 800, 900])


def test_parse_state_sequence_malformed_raises():
    """A non-noise malformed window raises, matching the reference's
    'Segment states are not correct!' (databuilder.ipynb cell 25)."""
    states = ["S1", "S1", "systole", "S2", "diastole", "S1"]
    with pytest.raises(ValueError, match="not correct"):
        parse_state_sequence(np.arange(6) * 100, states)


def test_parse_umc_state_trace(tmp_path):
    trace = np.concatenate(
        [np.full(50, 1), np.full(120, 2), np.full(40, 3), np.full(200, 4),
         np.full(45, 1)]
    )
    p = tmp_path / "rec.txt"
    np.savetxt(p, trace, fmt="%d")
    frames, states = parse_umc_state_trace(str(p))
    # transition-only stream (cell 14): the first, always-clipped state run
    # carries no transition and never becomes a cycle start
    assert states == ["systole", "S2", "diastole", "S1"]
    np.testing.assert_array_equal(frames, [50, 170, 210, 410])


def test_slice_cycles_zero_pad():
    y = np.arange(1000, dtype=np.float32)
    cycles = [np.array([100, 150, 300, 360, 600])]
    sigs, frames = slice_cycles(y, cycles, 800)
    assert sigs.shape == (1, 800)
    np.testing.assert_array_equal(frames[0], [0, 50, 200, 260, 500])
    np.testing.assert_array_equal(sigs[0, :500], y[100:600])
    assert np.all(sigs[0, 500:] == 0)


def _synthetic_recordings(n=3, sr=2000, seconds=4, seed=0):
    rng = np.random.default_rng(seed)
    recs = {}
    for i in range(n):
        t = np.arange(sr * seconds) / sr
        y = np.sin(2 * np.pi * 60 * t) + 0.2 * rng.standard_normal(len(t))
        # annotation stream at sr: cycles of ~0.9 s
        frames, states = [0], ["diastole"]
        pos = 200
        while pos + 1800 < len(t):
            for name, dur in zip(
                ("S1", "systole", "S2", "diastole"), (200, 500, 180, 900)
            ):
                frames.append(pos)
                states.append(name)
                pos += dur
        recs[f"a{i:04d}"] = {
            "y": y.astype(np.float32),
            "frames": np.array(frames[1:]),
            "states": states[1:],
            "label": i % 2,
            "sig_qual": 1,
        }
    return recs


def test_build_1d_dataset_contract(tmp_path):
    recs = _synthetic_recordings()
    d = build_1d_dataset(recs, sig_len=2500)
    assert set(d) == {"data", "label", "frames", "wav", "sig_qual"}
    n = len(d["label"])
    assert n > 0
    for b, arr in d["data"].items():
        assert arr.shape == (n, 2500)
    assert d["frames"].shape == (n, 5)
    assert np.all(d["frames"][:, 0] == 0)
    assert np.all(d["frames"][:, -1] <= 2500)
    # zero-padded tails
    i = 0
    end = d["frames"][i, -1]
    assert np.all(d["data"]["25-400"][i, end:] == 0)
    # round-trips through the reference .dat container
    path = str(tmp_path / "ds.dat")
    dict2file(d, path)
    back = file2dict(path)
    np.testing.assert_array_equal(back["label"], d["label"])


def test_build_spectrogram_dataset_contract():
    recs = _synthetic_recordings(n=2)
    d = build_spectrogram_dataset(recs, size=64, fmax=500.0)
    n = len(d["label"])
    assert n > 0
    assert d["data"].shape == (n, 64, 64)
    assert d["frames"].shape == (n, 5)
    assert np.all(d["frames"] <= 64)
    assert np.isfinite(d["data"]).all()
