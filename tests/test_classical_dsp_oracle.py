"""Value-level oracles for classical/dsp.py (VERDICT r2 item #3).

The real reference stack (librosa 0.9.2 / PyWavelets / antropy) is not in
this image, so three layers of verification stand in:

1. analytic invariants with known closed-form answers (constant-signal DWT,
   pure-tone spectral moments, octave-invariant chroma),
2. independent naive re-derivations of each algorithm from its published
   definition (double-loop SampEn, explicit DCT-II cosine sum, slaney mel
   formula, per-output-sample DWT convolution) — structurally disjoint from
   the vectorized implementations they check,
3. a golden-fixture hook: tests/golden/classical_dsp_v1.npz (generated once
   by tests/make_classical_fixtures.py in an env WITH the real libraries)
   is compared value-by-value when present.
"""

import math
import os

import numpy as np
import pytest

from pcgmix_tpu.classical import dsp

SR = 1000
N_FFT = 256
HOP = 64

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "classical_dsp_v1.npz")


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(1234)
    t = np.arange(900) / SR
    return {
        "noise": rng.standard_normal(900),
        "tone": np.sin(2 * np.pi * 55.0 * t),
        "mix": (
            np.sin(2 * np.pi * 30.0 * t)
            + 0.5 * np.sin(2 * np.pi * 120.0 * t)
            + 0.1 * rng.standard_normal(900)
        ),
        "short": rng.standard_normal(40),
    }


# ---------------------------------------------------------------------------
# 1. analytic invariants
# ---------------------------------------------------------------------------

def test_dwt_constant_signal_analytic():
    """db4 low-pass coefficients sum to √2, high-pass to 0 → a constant
    signal decomposes to approx = c·(√2)^level, details ≈ 0."""
    c = 3.7
    coeffs = dsp.wavedec_db4(np.full(256, c), level=3)
    approx, details = coeffs[0], coeffs[1:]
    np.testing.assert_allclose(approx, c * 2 ** (3 / 2), rtol=1e-10)
    for d in details:
        np.testing.assert_allclose(d, 0.0, atol=1e-10)


def test_pure_tone_spectral_moments():
    t = np.arange(2000) / SR
    f0 = 125.0  # an exact bin at n_fft=256: bin 32
    y = np.sin(2 * np.pi * f0 * t)
    cent = dsp.spectral_centroid(y, SR, N_FFT, HOP)
    # interior frames: centroid within one bin of the tone
    bin_hz = SR / N_FFT
    assert np.all(np.abs(cent[2:-2] - f0) < bin_hz)
    bw = dsp.spectral_bandwidth(y, SR, N_FFT, HOP)
    assert np.all(bw[2:-2] < 4 * bin_hz)
    roll = dsp.spectral_rolloff(y, SR, N_FFT, HOP)
    assert np.all(np.abs(roll[2:-2] - f0) <= 2 * bin_hz)
    flat_tone = dsp.spectral_flatness(y, N_FFT, HOP)
    assert np.all(flat_tone[2:-2] < 0.02)


def test_white_noise_flatness_high(signals):
    flat = dsp.spectral_flatness(signals["noise"], N_FFT, HOP)
    assert np.median(flat) > 0.3


def test_chroma_octave_invariance():
    t = np.arange(2000) / SR
    args = []
    for f0 in (110.0, 220.0, 440.0):  # A2, A3, A4 — same pitch class
        ch = dsp.chroma_stft(np.sin(2 * np.pi * f0 * t), SR, N_FFT, HOP)
        args.append(int(np.argmax(ch.mean(axis=1))))
    assert args[0] == args[1] == args[2]


def test_zero_crossings_known_count():
    # 10 Hz square-ish sine over 1 s at 1 kHz: 20 sign changes
    t = np.arange(1000) / 1000.0
    y = np.sin(2 * np.pi * 10 * t + 0.1)
    assert dsp.zero_crossings(y) == 20


def test_sample_entropy_orders_regular_vs_noise(signals):
    t = np.arange(900) / SR
    periodic = np.sin(2 * np.pi * 20.0 * t)
    se_p = dsp.sample_entropy(periodic)
    se_n = dsp.sample_entropy(signals["noise"])
    assert se_p < se_n  # regularity → lower entropy
    assert 0 < se_p < 1 and se_n > 1


# ---------------------------------------------------------------------------
# 2. independent naive re-derivations
# ---------------------------------------------------------------------------

def _naive_stft_mag(y, n_fft, hop):
    """Per-frame loop + explicit DFT definition via np.fft on windowed
    slices of the reflect-padded signal."""
    pad = n_fft // 2
    ypad = np.pad(np.asarray(y, np.float64), pad, mode="reflect")
    win = np.array(
        [0.5 - 0.5 * math.cos(2 * math.pi * k / n_fft) for k in range(n_fft)]
    )
    cols = []
    start = 0
    while start + n_fft <= len(ypad):
        cols.append(np.abs(np.fft.rfft(ypad[start : start + n_fft] * win)))
        start += hop
    return np.stack(cols, axis=1)


def test_stft_mag_matches_naive(signals):
    for y in (signals["mix"], signals["short"]):
        got = dsp.stft_mag(y, N_FFT, HOP)
        ref = _naive_stft_mag(y, N_FFT, HOP)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_rms_matches_naive(signals):
    y = signals["mix"]
    got = dsp.rms(y, N_FFT, HOP)
    pad = N_FFT // 2
    ypad = np.pad(np.asarray(y, np.float64), pad)  # rms pads with zeros
    ref = []
    start = 0
    while start + N_FFT <= len(ypad):
        fr = ypad[start : start + N_FFT]
        ref.append(math.sqrt(sum(v * v for v in fr) / N_FFT))
        start += HOP
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def _naive_mel_fb(sr, n_fft, n_mels, fmin, fmax):
    """Slaney filterbank straight from the librosa 0.9.2 documentation:
    mel points via the 1000 Hz linear/log split, triangular weights,
    2/(f[m+2]-f[m]) area normalization."""

    def hz2mel(f):
        if f < 1000.0:
            return f / (200.0 / 3)
        return 15.0 + math.log(f / 1000.0) / (math.log(6.4) / 27.0)

    def mel2hz(m):
        if m < 15.0:
            return m * (200.0 / 3)
        return 1000.0 * math.exp((m - 15.0) * math.log(6.4) / 27.0)

    pts = [
        mel2hz(hz2mel(fmin) + (hz2mel(fmax) - hz2mel(fmin)) * i / (n_mels + 1))
        for i in range(n_mels + 2)
    ]
    fft_freqs = [k * sr / n_fft for k in range(n_fft // 2 + 1)]
    fb = np.zeros((n_mels, len(fft_freqs)))
    for m in range(n_mels):
        lo, ctr, hi = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(fft_freqs):
            if lo < f < ctr:
                w = (f - lo) / (ctr - lo)
            elif ctr <= f < hi:
                w = (hi - f) / (hi - ctr)
            elif f == ctr:
                w = 1.0
            else:
                w = 0.0
            fb[m, k] = w * 2.0 / (hi - lo)
    return fb


def test_mel_filterbank_matches_slaney_formula():
    from pcgmix_tpu.ops.spectrogram import mel_filterbank

    got = np.asarray(mel_filterbank(SR, N_FFT, 20, 25.0, 400.0))
    ref = _naive_mel_fb(SR, N_FFT, 20, 25.0, 400.0)
    np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-10)


def test_mfcc_matches_explicit_dct(signals):
    y = signals["mix"]
    got = dsp.mfcc(y, SR, N_FFT, HOP, n_mfcc=13)
    mel = dsp.melspectrogram_np(y, SR, N_FFT, HOP)
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    N = db.shape[0]
    # orthonormal DCT-II from its cosine-sum definition
    ref = np.zeros((13, db.shape[1]))
    for k in range(13):
        scale = math.sqrt((1.0 if k == 0 else 2.0) / N)
        basis = np.array(
            [math.cos(math.pi * k * (2 * n + 1) / (2 * N)) for n in range(N)]
        )
        ref[k] = scale * basis @ db
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)


def test_sample_entropy_matches_double_loop(signals):
    """SampEn(m=2, r=0.2σ, Chebyshev) from Richman & Moorman's definition,
    as a direct O(n²) double loop."""
    y = np.asarray(signals["mix"][:120], np.float64)  # regular enough that
    n, m = len(y), 2                                  # m+1 matches exist
    r = 0.2 * np.std(y)
    b = a = 0
    for i in range(n - m):
        for j in range(i + 1, n - m):
            if max(abs(y[i + k] - y[j + k]) for k in range(m)) < r:
                b += 1
            if max(abs(y[i + k] - y[j + k]) for k in range(m + 1)) < r:
                a += 1
    ref = -math.log(a / b)
    got = dsp.sample_entropy(y, order=2)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_dwt_matches_per_sample_convolution(signals):
    """pywt dwt definition: symmetric half-point extension, full
    convolution with the decomposition filter, downsample odd indices —
    written as an explicit per-output-sample sum."""
    y = np.asarray(signals["short"], np.float64)
    flen = 8
    lo, hi = dsp._DB4_LO, dsp._DB4_HI
    ext = np.concatenate([y[:flen - 1][::-1], y, y[-(flen - 1):][::-1]])
    n_out = (len(y) + flen - 1) // 2
    ref_lo = np.zeros(n_out)
    ref_hi = np.zeros(n_out)
    for k in range(n_out):
        acc_l = acc_h = 0.0
        for j in range(flen):
            acc_l += lo[j] * ext[2 * k + 1 + (flen - 1) - j]
            acc_h += hi[j] * ext[2 * k + 1 + (flen - 1) - j]
        ref_lo[k] = acc_l
        ref_hi[k] = acc_h
    got_lo, got_hi = dsp._dwt_step(y)
    np.testing.assert_allclose(got_lo, ref_lo, rtol=1e-12)
    np.testing.assert_allclose(got_hi, ref_hi, rtol=1e-12)


def test_spectral_contrast_matches_naive(signals):
    """Per-band loop re-derivation of librosa's contrast (sorted sub-band
    magnitudes, 2% quantile mean valley/peak, log10 difference)."""
    y = signals["mix"]
    got = dsp.spectral_contrast(y, SR, N_FFT, HOP, fmin=25, n_bands=5)
    S = _naive_stft_mag(y, N_FFT, HOP)
    freqs = np.linspace(0, SR / 2, S.shape[0])
    edges = [0.0] + [25.0 * 2.0**b for b in range(6)]
    for k in range(6):
        f_lo, f_hi = edges[k], edges[k + 1]
        sel = (freqs >= f_lo) & (freqs <= f_hi)
        first = np.flatnonzero(sel)[0]
        if first > 0:
            sel[first - 1] = True
        n_q = max(int(0.02 * sel.sum()), 1)
        for j in (0, S.shape[1] // 2):
            col = np.sort(S[sel, j])
            valley = col[:n_q].mean()
            peak = col[-n_q:].mean()
            expect = math.log10(max(peak, 1e-10)) - math.log10(max(valley, 1e-10))
            np.testing.assert_allclose(got[k, j], expect, rtol=1e-9)


# ---------------------------------------------------------------------------
# 3. golden fixture (real librosa/pywt/antropy values, vendored)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="tests/golden/classical_dsp_v1.npz absent — generate once with "
    "tests/make_classical_fixtures.py in an env that has librosa 0.9.2, "
    "PyWavelets and antropy (the reference's requirements.txt stack)",
)
def test_dsp_golden_values():
    z = np.load(GOLDEN)
    names = sorted({k.split("/")[0] for k in z.files})
    for name in names:
        y = z[f"{name}/signal"]
        y32 = y.astype(np.float32)

        def chk(key, got, rtol=1e-4, atol=1e-5):
            np.testing.assert_allclose(
                np.asarray(got, np.float64), z[f"{name}/{key}"],
                rtol=rtol, atol=atol, err_msg=f"{name}/{key}",
            )

        chk("rms", dsp.rms(y32, N_FFT, HOP))
        chk("zcr", float(dsp.zero_crossings(y32)))
        chk("centroid", dsp.spectral_centroid(y32, SR, N_FFT, HOP))
        chk("bandwidth", dsp.spectral_bandwidth(y32, SR, N_FFT, HOP))
        chk("flatness", dsp.spectral_flatness(y32, N_FFT, HOP))
        chk("rolloff", dsp.spectral_rolloff(y32, SR, N_FFT, HOP))
        chk("contrast",
            dsp.spectral_contrast(y32, SR, N_FFT, HOP, fmin=25, n_bands=5))
        chk("poly", dsp.poly_features(y32, SR, N_FFT, HOP))
        chk("chroma", dsp.chroma_stft(y32, SR, N_FFT, HOP), rtol=1e-3, atol=1e-4)
        chk("mel", dsp.melspectrogram_np(y32, SR, N_FFT, HOP), rtol=1e-3)
        chk("mfcc", dsp.mfcc(y32, SR, N_FFT, HOP), rtol=1e-3, atol=1e-3)
        chk("sampen", dsp.sample_entropy(y), rtol=1e-6)
        coeffs = dsp.wavedec_db4(y, level=5)
        for lvl, c in enumerate(coeffs):
            chk(f"dwt{lvl}", c, rtol=1e-8, atol=1e-10)
