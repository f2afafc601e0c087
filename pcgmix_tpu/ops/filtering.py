"""Zero-phase IIR filtering and polyphase resampling (the databuilder's
upstream signal path, SURVEY.md §2.2: "4th-order zero-phase band-pass IIR
(Butterworth) per band + RMS normalization", then resampling to 1 kHz).

Design: the IIR path is an *offline builder* step whose parity target is
scipy itself, so filter design AND application delegate to scipy on host
(bit-identical to the reference's preprocessing by definition, and C-speed
for real-corpus builds).  The polyphase resampler runs in JAX as a strided
FIR convolution (MXU-friendly); both are covered by parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def butter_bandpass(lo: float, hi: float, fs: float, order: int = 4):
    """Butterworth band-pass (b, a) via scipy's design routine (host)."""
    from scipy.signal import butter

    # a band edge at Nyquist (e.g. the 25-1000 band at fs=2000) is clipped
    # just below it — the digital design requires Wn < 1
    hi = min(hi, 0.999 * fs / 2.0)
    b, a = butter(order, [lo, hi], btype="bandpass", fs=fs)
    return np.asarray(b), np.asarray(a)


def filtfilt(b: np.ndarray, a: np.ndarray, x) -> jax.Array:
    """Zero-phase filtering matching scipy.signal.filtfilt defaults
    (padtype='odd', padlen=3·max(len(a),len(b)), method='pad').

    x: (..., T) with T > padlen.  Delegates to scipy.signal.filtfilt in
    float64 on host — the parity target for the reference's offline
    preprocessing ('raw_filtBandIIR(ZP)4-{band}' wav dirs) IS scipy, so
    this is bit-identical by definition and runs at C speed for
    real-corpus builds — then casts back to the input dtype.
    """
    from scipy.signal import filtfilt as _scipy_filtfilt

    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    padlen = 3 * max(len(a), len(b))
    if x.shape[-1] <= padlen:
        raise ValueError(f"signal length {x.shape[-1]} must exceed padlen {padlen}")
    orig_dtype = x.dtype
    y = _scipy_filtfilt(b, a, np.asarray(x, np.float64), axis=-1)
    return jnp.asarray(y, orig_dtype)

def bandpass_filtfilt(
    x: jax.Array, lo: float, hi: float, fs: float, order: int = 4
) -> jax.Array:
    """4th-order zero-phase Butterworth band-pass — the per-band filter the
    reference's wavs were preprocessed with (databuilder.ipynb path names
    'raw_filtBandIIR(ZP)4-{band}')."""
    b, a = butter_bandpass(lo, hi, fs, order)
    return filtfilt(b, a, x)


def rms_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Normalize to unit RMS (the '_normRMS' step of the upstream path)."""
    rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(rms, eps)


def rms_normalize_host(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """NumPy twin of :func:`rms_normalize` for the host-only builder path
    (per-call device dispatch measured 10.6x slower than C-speed NumPy for
    offline corpus builds — BENCH.md builder-throughput table,
    scripts/bench_builder.py)."""
    rms = float(np.sqrt(np.mean(np.square(x))))
    return x / max(rms, eps)


def resample_poly_host(y: np.ndarray, up: int, down: int) -> np.ndarray:
    """scipy polyphase resample on host: float64 compute, float32 out — the
    corpus builds' stand-in for librosa.resample (see :func:`resample_poly`
    on the equivalence).  The single home for the gcd+resample_poly idiom
    used by every builder/corpus call site."""
    from math import gcd

    from scipy.signal import resample_poly as _scipy_resample

    g = gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == down == 1:
        return np.asarray(y, np.float32)
    return _scipy_resample(np.asarray(y, np.float64), up, down).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _resample_filter(up: int, down: int) -> np.ndarray:
    """scipy.signal.resample_poly's default FIR prototype: kaiser(β=5) windowed
    sinc with cutoff at min(up, down)."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    return firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))


def resample_poly(x: jax.Array, up: int, down: int) -> jax.Array:
    """Polyphase resampling along the last axis, matching
    scipy.signal.resample_poly(x, up, down) (kaiser β=5 prototype, zero
    padding).  The reference's databuilder resamples 2 kHz/4 kHz wavs to
    1 kHz with librosa.resample (databuilder.ipynb cells 14/25); librosa
    0.9.2's resampy 'kaiser_best' and this polyphase kaiser filter are both
    windowed-sinc anti-aliased resamplers (equivalent to well below the
    band-pass ripple, not bit-identical — the raw corpus is outside the
    repo, so only behavioral equivalence is testable).
    """
    from math import gcd

    g = gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    h = _resample_filter(up, down) * up
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil

    # upsample by zero-stuffing, convolve, downsample — expressed as a
    # single strided conv per polyphase branch for efficiency.
    h_len = len(h)
    # center the filter like scipy (group delay compensation)
    half = (h_len - 1) // 2
    x2 = x.reshape(-1, 1, n_in)
    # zero-stuff: (N, 1, n_in*up)
    up_sig = jnp.zeros((x2.shape[0], 1, n_in * up), x.dtype)
    up_sig = up_sig.at[..., ::up].set(x2)
    pad_l = half
    pad_r = h_len  # generous right pad; we slice the exact outputs below
    up_sig = jnp.pad(up_sig, ((0, 0), (0, 0), (pad_l, pad_r)))
    y = jax.lax.conv_general_dilated(
        up_sig,
        jnp.asarray(h[::-1].copy(), x.dtype)[None, None, :],
        window_strides=(down,),
        padding=[(0, 0)],
    )
    y = y[..., :n_out]
    return y.reshape(x.shape[:-1] + (n_out,))
