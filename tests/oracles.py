"""Per-sample NumPy oracles implementing the *reference semantics* of each
augmentation kernel (fresh implementations of the behaviors documented in
SURVEY.md §2.4, used to validate the vmapped masked-gather kernels).

These intentionally mirror the reference's slice-by-slice style so that any
disagreement with the vectorized device kernels is a bug in the kernels.
"""

from __future__ import annotations

import random

import numpy as np


def mixup_keepdur_oracle(d1, d2, f1, f2, lam, rand_seed=None):
    """Duration-ratio segment blend of one sample pair.

    Semantics of mixup_keepdur_multidim_tensors (augmentations.py:289-338):
    keep d1's layout; per segment blend the min-length window aligned at the
    segment start, or displaced by randint(0, |gap|) on the longer side when
    rand_seed is given ((rand) variant).
    """
    out = d1.copy()
    for k in range(4):
        l1 = f1[k + 1] - f1[k]
        l2 = f2[k + 1] - f2[k]
        L = min(l1, l2)
        gap = l2 - l1
        disp = 0
        if rand_seed is not None:
            disp = random.Random(rand_seed).randint(0, abs(gap))
        if gap >= 0:
            a, b = f1[k], f2[k] + disp
        else:
            a, b = f1[k] + disp, f2[k]
        out[..., a : a + L] = out[..., a : a + L] * lam + d2[..., b : b + L] * (1 - lam)
    return out


def cutmix_keepdur_oracle(d1, d2, f1, f2, rand_seed=None):
    """Swap systole & diastole windows (cutmix_keepdur_multidim_tensors,
    augmentations.py:340-366)."""
    out = d1.copy()
    for k in (1, 3):
        l1 = f1[k + 1] - f1[k]
        l2 = f2[k + 1] - f2[k]
        L = min(l1, l2)
        gap = l2 - l1
        disp = 0
        if rand_seed is not None:
            disp = random.Random(rand_seed).randint(0, abs(gap))
        if gap >= 0:
            a, b = f1[k], f2[k] + disp
        else:
            a, b = f1[k] + disp, f2[k]
        out[..., a : a + L] = d2[..., b : b + L]
    return out


def concat_cutmix_oracle(d1, d2, f1, f2, cut, sig_len, smooth=False, overlap=10):
    """First `cut` segments of d1 + remainder of d2, zero tail, new frames
    (cutmix_multidim_tensors, augmentations.py:30-58)."""
    num_channels = d1.shape[0]
    d1_cut_len = f1[cut]
    d2_cut_len = f2[-1] - f2[cut]
    d_connected = d1_cut_len + d2_cut_len
    out = np.zeros((num_channels, sig_len), dtype=d1.dtype)
    last = min(d_connected, sig_len)
    out[:, : f1[cut]] = d1[:, : f1[cut]]
    out[:, f1[cut] : last] = d2[:, f2[cut] : f2[cut] + last - f1[cut]]
    if smooth:
        ov = min(overlap, d1_cut_len, d2_cut_len, f1[-1] - f1[cut], f2[cut])
        sig = np.array(
            [1.0 / (1.0 + np.exp(-x)) for x in np.linspace(-8, 8, ov * 2)]
        )
        sig[0] = 0.0
        sig[-1] = 1.0
        w2 = sig[None, :]
        w1 = 1 - w2
        out[:, f1[cut] - ov : f1[cut] + ov] = (
            d1[:, f1[cut] - ov : f1[cut] + ov] * w1
            + d2[:, f2[cut] - ov : f2[cut] + ov] * w2
        )
    f_new = list(f1[: cut + 1]) + list(f2[cut + 1 :] - f2[cut] + f1[cut])
    f_new = np.array(f_new)
    if f_new[-1] > last:
        f_new[-1] = last
    return out, f_new


def swapsysdia_oracle(d1, d2, f1, f2, sig_len):
    """Re-concatenate d1's S1/S2 with d2's systole/diastole
    (augmentations.py:1335-1348). Returns (out, lam)."""
    C = d1.shape[0]
    s1 = f1[1] - f1[0]
    s2 = f1[3] - f1[2]
    sys2 = f2[2] - f2[1]
    dia2 = f2[4] - f2[3]
    buf = np.zeros((C, sig_len * 2), dtype=d1.dtype)
    buf[:, 0:s1] = d1[:, 0 : f1[1]]
    buf[:, s1 : s1 + sys2] = d2[:, f2[1] : f2[2]]
    buf[:, s1 + sys2 : s1 + sys2 + s2] = d1[:, f1[2] : f1[3]]
    buf[:, s1 + sys2 + s2 : s1 + sys2 + s2 + dia2] = d2[:, f2[3] : f2[4]]
    lam = (s1 + s2) / (s1 + sys2 + s2 + dia2)
    return buf[:, :sig_len], lam


def magnitude_warp_oracle(x_btc, sigma, knot, knots=None):
    """Reference magnitude_warp semantics (augmentations.py:674-683).
    x_btc: (B, T, C). knots: optional (B, knot+2, C) to bypass the RNG."""
    from scipy.interpolate import CubicSpline

    B, T, C = x_btc.shape
    orig = np.arange(T)
    if knots is None:
        knots = np.random.normal(1.0, sigma, size=(B, knot + 2, C))
    steps = np.linspace(0, T - 1.0, num=knot + 2)
    out = np.zeros_like(x_btc)
    for i in range(B):
        warper = np.array(
            [CubicSpline(steps, knots[i, :, c])(orig) for c in range(C)]
        ).T
        out[i] = x_btc[i] * warper
    return out


def time_warp_oracle(x_btc, sigma, knot, knots=None):
    """Reference time_warp semantics (augmentations.py:685-696)."""
    from scipy.interpolate import CubicSpline

    B, T, C = x_btc.shape
    orig = np.arange(T)
    if knots is None:
        knots = np.random.normal(1.0, sigma, size=(B, knot + 2, C))
    steps = np.linspace(0, T - 1.0, num=knot + 2)
    out = np.zeros_like(x_btc)
    for i in range(B):
        for c in range(C):
            tw = CubicSpline(steps, steps * knots[i, :, c])(orig)
            scale = (T - 1) / tw[-1]
            out[i, :, c] = np.interp(orig, np.clip(scale * tw, 0, T - 1), x_btc[i, :, c])
    return out
