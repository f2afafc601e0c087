"""Filtering/resampling/spectrogram parity tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcgmix_tpu.ops.filtering import (
    bandpass_filtfilt,
    butter_bandpass,
    filtfilt,
    resample_poly,
    rms_normalize,
)
from pcgmix_tpu.ops.spectrogram import (
    hann_periodic,
    mel_filterbank,
    melspectrogram,
    power_to_db,
    stft_power,
)


def test_filtfilt_matches_scipy(rng):
    from scipy.signal import butter, filtfilt as sp_filtfilt

    x = rng.normal(size=(3, 400)).astype(np.float32)
    b, a = butter(4, [25, 400], btype="bandpass", fs=2000)
    ours = np.asarray(filtfilt(b, a, jnp.asarray(x)))
    theirs = sp_filtfilt(b, a, x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_bandpass_passband_gain(rng):
    # a 100 Hz tone passes the 25-400 band; a 900 Hz tone is attenuated
    t = np.arange(2000) / 2000.0
    tone_in = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    tone_out = np.sin(2 * np.pi * 900 * t).astype(np.float32)
    y_in = np.asarray(bandpass_filtfilt(jnp.asarray(tone_in), 25, 400, 2000))
    y_out = np.asarray(bandpass_filtfilt(jnp.asarray(tone_out), 25, 400, 2000))
    assert np.std(y_in[200:-200]) > 0.5
    assert np.std(y_out[200:-200]) < 0.01


def test_resample_poly_matches_scipy(rng):
    from scipy.signal import resample_poly as sp_resample

    x = rng.normal(size=(2, 1000)).astype(np.float32)
    ours = np.asarray(resample_poly(jnp.asarray(x), 1, 2))
    theirs = sp_resample(x.astype(np.float64), 1, 2, axis=-1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_resample_identity(rng):
    x = rng.normal(size=(1, 100)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resample_poly(jnp.asarray(x), 2, 2)), x)


def test_rms_normalize(rng):
    x = rng.normal(size=(4, 500)).astype(np.float32) * 7.3
    y = np.asarray(rms_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.sqrt(np.mean(y**2, axis=-1)), 1.0, rtol=1e-5)


def test_mel_filterbank_properties():
    fb = mel_filterbank(1000.0, 1024, 64, 25.0, 500.0)
    assert fb.shape == (64, 513)
    assert np.all(fb >= 0)
    assert np.all(fb.sum(axis=1) > 0)  # every filter is non-empty
    # filters tile the [fmin, fmax] range: energy outside is zero
    freqs = np.linspace(0, 500, 513)
    outside = fb[:, freqs < 20].sum() + fb[:, freqs > 500].sum()
    assert outside == 0


def test_stft_power_parseval_tone():
    """A pure tone's STFT power concentrates at its frequency bin."""
    sr, n_fft, hop = 1000, 256, 64
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 125 * t).astype(np.float32)
    p = np.asarray(stft_power(jnp.asarray(y), n_fft, hop))
    peak_bin = p[:, 4:-4].mean(axis=1).argmax()
    expected_bin = round(125 * n_fft / sr)
    assert abs(int(peak_bin) - expected_bin) <= 1


def test_stft_matches_manual_frame(rng):
    """Cross-check one interior frame against a direct windowed FFT."""
    y = rng.normal(size=512).astype(np.float32)
    n_fft, hop = 128, 32
    p = np.asarray(stft_power(jnp.asarray(y), n_fft, hop))
    k = 5
    start = k * hop - n_fft // 2  # centered framing on the padded signal
    seg = y[start : start + n_fft] * hann_periodic(n_fft)
    manual = np.abs(np.fft.rfft(seg)) ** 2
    np.testing.assert_allclose(p[:, k], manual, rtol=1e-3, atol=1e-4)


def test_power_to_db_ref_max_and_topdb():
    s = np.array([[[1e-12, 1.0], [100.0, 10.0]]], np.float32)  # (1, 2, 2)
    db = np.asarray(power_to_db(jnp.asarray(s)))
    assert db.max() == 0.0  # ref=max
    assert db.min() >= -80.0  # top_db floor
    np.testing.assert_allclose(db[0, 1, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(db[0, 1, 1], -10.0, atol=1e-4)


def test_melspectrogram_shapes():
    sr, size = 1000, 64
    hop = int(sr * 2.2 / size)
    y = jnp.asarray(np.random.default_rng(0).normal(size=int(sr * 2.2)), jnp.float32)
    mel = melspectrogram(y, sr, size, 25.0, 500.0, hop)
    assert mel.shape[0] == size
    assert mel.shape[1] >= size
