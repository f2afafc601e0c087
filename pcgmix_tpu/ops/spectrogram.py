"""Mel spectrograms with librosa-0.9.2 semantics, as batched XLA ops.

The reference builds spectrogram datasets with
``librosa.feature.melspectrogram(y, sr, n_mels, fmin, fmax, hop_length,
n_fft=4·hop)`` + ``librosa.power_to_db(ref=np.max)`` (databuilder.ipynb
cells 3, 5-6; librosa==0.9.2 per requirements.txt).  That stack decomposes
into: centered reflect-padded STFT with a periodic Hann window → power →
slaney-scale, slaney-normalized mel filterbank → 10·log10 with per-input
max reference and top_db=80 flooring.  All steps are reimplemented here from
the documented algorithm (librosa itself is not available in this image);
the mel filterbank matmul is the MXU hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann window (librosa's default stft window)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def hz_to_mel(f, htk: bool = False):
    f = np.asanyarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels
    )


def mel_to_hz(m, htk: bool = False):
    m = np.asanyarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sr: float, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank (n_mels, 1 + n_fft//2)."""
    fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def stft_power(
    y: jax.Array, n_fft: int, hop_length: int, center: bool = True
) -> jax.Array:
    """|STFT|² with librosa conventions: win_length=n_fft periodic Hann,
    center=True with reflect padding.  y: (..., T) → (..., 1+n_fft//2, frames)."""
    if center:
        pad = n_fft // 2
        y = jnp.concatenate(
            [y[..., 1 : pad + 1][..., ::-1], y, y[..., -pad - 1 : -1][..., ::-1]],
            axis=-1,
        )
    n = y.shape[-1]
    frames = 1 + (n - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(frames)[:, None]
    segs = y[..., idx]  # (..., frames, n_fft)
    win = jnp.asarray(hann_periodic(n_fft), y.dtype)
    spec = jnp.fft.rfft(segs * win, axis=-1)
    power = jnp.square(jnp.abs(spec))
    return jnp.swapaxes(power, -1, -2)  # (..., freq, frames)


def melspectrogram(
    y: jax.Array,
    sr: float,
    n_mels: int,
    fmin: float,
    fmax: float,
    hop_length: int,
    n_fft: int | None = None,
) -> jax.Array:
    """librosa.feature.melspectrogram equivalent (power=2).  The reference
    uses n_fft = 4·hop (databuilder.ipynb cell 5)."""
    n_fft = n_fft or 4 * hop_length
    power = stft_power(y, n_fft, hop_length)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    return jnp.einsum(
        "mf,...ft->...mt", fb, power, precision=jax.lax.Precision.HIGHEST
    )


def power_to_db(
    s: jax.Array, amin: float = 1e-10, top_db: float = 80.0
) -> jax.Array:
    """librosa.power_to_db(S, ref=np.max) with the max taken per spectrogram
    (over the trailing freq×time axes — the per-recording max, not a
    per-segment one; SURVEY.md §7)."""
    reduce_axes = (s.ndim - 2, s.ndim - 1)
    ref = jnp.max(s, axis=reduce_axes, keepdims=True)
    log_spec = 10.0 * jnp.log10(jnp.maximum(s, amin))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(ref, amin))
    floor = jnp.max(log_spec, axis=reduce_axes, keepdims=True) - top_db
    return jnp.maximum(log_spec, floor)
