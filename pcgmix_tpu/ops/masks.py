"""Mask-style augmentation ops (timemask, cutout, s1s2mask, freqmask, tails).

The reference zeroes slices per sample in Python loops
(augmentations.py:823-827 timemask, :1595-1614 cutout, :1628-1632 s1s2mask;
augmentations2d.py:455-508 freq/time masks).  Here each is a vectorized
``where`` over the fixed time (and frequency) axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interval_mask(sig_len: int, start, stop, dtype=jnp.bool_) -> jax.Array:
    """(..., T) boolean mask that is True on [start, stop).

    ``start``/``stop`` may carry leading batch dims; they broadcast against
    the trailing time axis.
    """
    t = jnp.arange(sig_len, dtype=jnp.int32)
    start = jnp.asarray(start, jnp.int32)[..., None]
    stop = jnp.asarray(stop, jnp.int32)[..., None]
    return ((t >= start) & (t < stop)).astype(dtype)


def time_mask(data: jax.Array, start, stop) -> jax.Array:
    """Zero data[..., start:stop) per sample.

    data: (B, C, T) or (B, C, F, T); start/stop: (B,) int.
    Equivalent to the timemask/cutout inner loop (augmentations.py:823-827).
    """
    mask = interval_mask(data.shape[-1], start, stop)  # (B, T)
    mask = mask.reshape(mask.shape[0], *([1] * (data.ndim - 2)), mask.shape[-1])
    return jnp.where(mask, jnp.zeros((), data.dtype), data)


def freq_time_mask(data: jax.Array, fstart: int, fstop: int, tstart, tstop):
    """Zero a (freq-band × per-sample time window) box of a spectrogram batch.

    data: (B, C, F, T); fstart/fstop: python ints (shared across the batch,
    augmentations2d.py:452-458); tstart/tstop: (B,) ints.
    With tstart=0, tstop=T this is a pure freqmask (augmentations2d.py:505-507).
    """
    B, _, F, T = data.shape
    fmask = ((jnp.arange(F) >= fstart) & (jnp.arange(F) < fstop))[None, None, :, None]
    tmask = interval_mask(T, tstart, tstop)[:, None, None, :]
    return jnp.where(fmask & tmask.astype(bool), jnp.zeros((), data.dtype), data)


def s1s2_mask(data: jax.Array, frames: jax.Array) -> jax.Array:
    """Zero the S1 and S2 regions per sample (augmentations.py:1628-1632).

    data: (B, C, T); frames: (B, 5) int.
    """
    m1 = interval_mask(data.shape[-1], frames[:, 0], frames[:, 1])
    m2 = interval_mask(data.shape[-1], frames[:, 2], frames[:, 3])
    mask = (m1 | m2)[:, None, :]
    return jnp.where(mask, jnp.zeros((), data.dtype), data)


def zero_after(data: jax.Array, end: jax.Array) -> jax.Array:
    """Zero everything at/after per-sample index ``end`` on the time axis.

    Used to keep zero-padded tails exactly zero after additive transforms
    (e.g. gaussian noise, augmentations.py:1076; saliency tails,
    saliency.py:66-67).  data: (B, ..., T); end: (B,).
    """
    t = jnp.arange(data.shape[-1], dtype=jnp.int32)
    keep = t[None, :] < jnp.asarray(end, jnp.int32)[:, None]  # (B, T)
    keep = keep.reshape(keep.shape[0], *([1] * (data.ndim - 2)), keep.shape[-1])
    return jnp.where(keep, data, jnp.zeros((), data.dtype))
