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


def _lfilter_scan(b: jax.Array, a: jax.Array, x: jax.Array, zi: jax.Array):
    """Direct-form II transposed IIR filter along the last axis.

    x: (..., T); zi: (..., order) initial conditions (scipy lfilter zi
    convention).  Returns filtered signal.
    """
    def step(z, xt):
        # xt: (...,) ; z: (..., order) DF2T state
        yt = b[0] * xt + z[..., 0]
        shifted = jnp.concatenate(
            [z[..., 1:], jnp.zeros_like(z[..., :1])], axis=-1
        )
        znew = shifted + b[1:] * xt[..., None] - a[1:] * yt[..., None]
        return znew, yt

    xs = jnp.moveaxis(x, -1, 0)
    _, ys = jax.lax.scan(step, zi, xs)
    return jnp.moveaxis(ys, 0, -1)


def filtfilt(b: np.ndarray, a: np.ndarray, x: jax.Array) -> jax.Array:
    """Zero-phase filtering matching scipy.signal.filtfilt defaults
    (padtype='odd', padlen=3·max(len(a),len(b)), method='pad').

    x: (..., T) with T > padlen.  The IIR recurrence accumulates rounding
    error, so it runs in float64 (this is the offline builder's host path;
    scipy-parity demands it) and casts back to the input dtype.
    """
    from scipy.signal import lfilter_zi

    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    ntaps = max(len(a), len(b))
    padlen = 3 * ntaps
    if x.shape[-1] <= padlen:
        raise ValueError(f"signal length {x.shape[-1]} must exceed padlen {padlen}")
    zi_np = lfilter_zi(b, a)  # (order,)

    orig_dtype = x.dtype
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        bj = jnp.asarray(b, jnp.float64)
        aj = jnp.asarray(a, jnp.float64)
        zi = jnp.asarray(zi_np, jnp.float64)
        x64 = jnp.asarray(np.asarray(x), jnp.float64)

        # odd extension on both ends (scipy _validate_pad)
        left = 2 * x64[..., :1] - x64[..., 1 : padlen + 1][..., ::-1]
        right = 2 * x64[..., -1:] - x64[..., -padlen - 1 : -1][..., ::-1]
        ext = jnp.concatenate([left, x64, right], axis=-1)

        zi_fwd = zi * ext[..., :1]
        y = _lfilter_scan(
            bj, aj, ext, jnp.broadcast_to(zi_fwd, ext.shape[:-1] + zi.shape)
        )
        yr = y[..., ::-1]
        zi_bwd = zi * yr[..., :1]
        y2 = _lfilter_scan(
            bj, aj, yr, jnp.broadcast_to(zi_bwd, ext.shape[:-1] + zi.shape)
        )
        y2 = y2[..., ::-1]
        out = np.asarray(y2[..., padlen:-padlen])
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
    return jnp.asarray(out, orig_dtype)


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
