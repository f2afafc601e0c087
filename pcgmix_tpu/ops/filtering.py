"""Zero-phase IIR filtering and polyphase resampling (the databuilder's
upstream signal path, SURVEY.md §2.2: "4th-order zero-phase band-pass IIR
(Butterworth) per band + RMS normalization", then resampling to 1 kHz).

Design: filter *design* stays on host (scipy, tiny), filter *application*
runs in JAX — the IIR recurrence as a ``lax.scan`` over time carrying the
direct-form-II-transposed state, vmapped over (batch, channels); the
polyphase resampler as a strided FIR convolution (MXU-friendly).
scipy.signal.filtfilt parity (default odd padding + lfilter_zi initial
conditions) is exact to float tolerance and covered by tests.
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


def _lfilter_scan(b, a, x, zi):
    """Direct-form II transposed IIR filter along the last axis.

    x: (..., T) float64 numpy; zi: (..., order) initial conditions (scipy
    lfilter zi convention).  Runs as a vectorized NumPy time loop: the
    recurrence needs float64 for scipy parity, and doing it on host avoids
    toggling the process-global jax_enable_x64 flag (not thread-safe —
    a concurrent fp32 trace on another thread would see f64 constants).
    """
    x = np.asarray(x, np.float64)
    z = np.array(np.broadcast_to(zi, x.shape[:-1] + zi.shape[-1:]), np.float64)
    y = np.empty_like(x)
    for t in range(x.shape[-1]):
        xt = x[..., t]
        yt = b[0] * xt + z[..., 0]
        z[..., :-1] = z[..., 1:] + b[1:-1, None].T * xt[..., None]             - a[1:-1, None].T * yt[..., None] if False else z[..., :-1]
        # DF2T update (vectorized over leading dims)
        z = np.concatenate(
            [z[..., 1:], np.zeros_like(z[..., :1])], axis=-1
        ) + b[1:] * xt[..., None] - a[1:] * yt[..., None]
        y[..., t] = yt
    return y


def filtfilt(b: np.ndarray, a: np.ndarray, x) -> jax.Array:
    """Zero-phase filtering matching scipy.signal.filtfilt defaults
    (padtype='odd', padlen=3·max(len(a),len(b)), method='pad').

    x: (..., T) with T > padlen.  The IIR recurrence accumulates rounding
    error, so it runs in float64 NumPy on host (this is the offline
    builder's path; scipy-parity demands f64, and host execution avoids the
    process-global jax_enable_x64 flag) and casts back to the input dtype.
    """
    from scipy.signal import lfilter_zi

    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    ntaps = max(len(a), len(b))
    padlen = 3 * ntaps
    if x.shape[-1] <= padlen:
        raise ValueError(f"signal length {x.shape[-1]} must exceed padlen {padlen}")
    zi = lfilter_zi(b, a)  # (order,)

    orig_dtype = x.dtype
    x64 = np.asarray(x, np.float64)

    # odd extension on both ends (scipy _validate_pad)
    left = 2 * x64[..., :1] - x64[..., 1 : padlen + 1][..., ::-1]
    right = 2 * x64[..., -1:] - x64[..., -padlen - 1 : -1][..., ::-1]
    ext = np.concatenate([left, x64, right], axis=-1)

    y = _lfilter_scan(b, a, ext, zi * ext[..., :1])
    yr = y[..., ::-1]
    y2 = _lfilter_scan(b, a, yr, zi * yr[..., :1])[..., ::-1]
    return jnp.asarray(y2[..., padlen:-padlen], orig_dtype)

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
