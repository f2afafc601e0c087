"""Kernel-vs-oracle tests for the piecewise mix op and segment blending."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcgmix_tpu.ops import piecewise_mix_batch, segment_blend_pieces
from pcgmix_tpu import rng as prng

from .conftest import make_frames
from .oracles import cutmix_keepdur_oracle, mixup_keepdur_oracle

B, C, T = 8, 4, 1024


def _batch(rng):
    data = rng.normal(size=(B, C, T)).astype(np.float32)
    frames = make_frames(rng, B, T)
    for i in range(B):
        data[i, :, frames[i, -1] :] = 0.0  # zero-padded tails per data contract
    return data, frames


def _run_blend(data, frames, mix, disp, lam_seg):
    f2 = frames[mix]
    pieces = segment_blend_pieces(frames, f2, disp, lam_seg)
    out = piecewise_mix_batch(
        jnp.asarray(data),
        jnp.asarray(mix),
        jnp.asarray(pieces["dst_start"]),
        jnp.asarray(pieces["src_start"]),
        jnp.asarray(pieces["length"]),
        jnp.asarray(pieces["src_sel"]),
        jnp.asarray(pieces["alpha"], jnp.float32),
    )
    return np.asarray(out)


def test_durratiomixup_matches_oracle(rng):
    data, frames = _batch(rng)
    mix = rng.permutation(B)
    lam = 0.37
    out = _run_blend(
        data, frames, mix, np.zeros((B, 4), np.int64), np.full((B, 4), lam, np.float32)
    )
    for i in range(B):
        exp = mixup_keepdur_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]], lam)
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)


def test_durratiomixup_rand_displacement_matches_oracle(rng):
    data, frames = _batch(rng)
    mix = rng.permutation(B)
    lam, step = 0.81, 1234
    # Host-side displacement draws, exactly as the reference does per sample
    # per segment (augmentations.py:305-338).
    disp = np.zeros((B, 4), np.int64)
    for i in range(B):
        for k in range(4):
            gap = (frames[mix[i], k + 1] - frames[mix[i], k]) - (
                frames[i, k + 1] - frames[i, k]
            )
            disp[i, k] = prng.py_randint(step, 0, abs(int(gap)))
    out = _run_blend(data, frames, mix, disp, np.full((B, 4), lam, np.float32))
    for i in range(B):
        exp = mixup_keepdur_oracle(
            data[i], data[mix[i]], frames[i], frames[mix[i]], lam, rand_seed=step
        )
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)


def test_durratiocutmix_matches_oracle(rng):
    data, frames = _batch(rng)
    mix = rng.permutation(B)
    # cutmix_keepdur = blend with alpha 0 on segments {sys, dia}, skip {S1, S2}:
    # encode skips as zero-length pieces.
    lam_seg = np.zeros((B, 4), np.float32)
    pieces = segment_blend_pieces(frames, frames[mix], np.zeros((B, 4), np.int64), lam_seg)
    length = np.asarray(pieces["length"]).copy()
    length[:, 0] = 0
    length[:, 2] = 0
    out = np.asarray(
        piecewise_mix_batch(
            jnp.asarray(data),
            jnp.asarray(mix),
            jnp.asarray(pieces["dst_start"]),
            jnp.asarray(pieces["src_start"]),
            jnp.asarray(length),
            jnp.asarray(pieces["src_sel"]),
            jnp.asarray(pieces["alpha"], jnp.float32),
        )
    )
    for i in range(B):
        exp = cutmix_keepdur_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]])
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("lam", [0.0, 1.0])
def test_blend_identities(rng, lam):
    """λ=1 must return d1 unchanged; λ=0 must paste d2 windows verbatim."""
    data, frames = _batch(rng)
    mix = np.roll(np.arange(B), 1)
    out = _run_blend(
        data, frames, mix, np.zeros((B, 4), np.int64), np.full((B, 4), lam, np.float32)
    )
    if lam == 1.0:
        np.testing.assert_allclose(out, data, rtol=1e-6, atol=1e-6)
    else:
        for i in range(B):
            exp = mixup_keepdur_oracle(
                data[i], data[mix[i]], frames[i], frames[mix[i]], 0.0
            )
            np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)


def test_zero_tail_preserved(rng):
    """Positions beyond frames[-1] of the *output layout* (d1) stay zero."""
    data, frames = _batch(rng)
    mix = rng.permutation(B)
    out = _run_blend(
        data, frames, mix, np.zeros((B, 4), np.int64), np.full((B, 4), 0.5, np.float32)
    )
    for i in range(B):
        assert np.all(out[i, :, frames[i, -1] :] == 0.0)


def test_spectrogram_layout(rng):
    """The same kernel must work on (B, C, F, T) spectrogram batches
    (augmentations2d.py:206-221 applies identical slice math on dim -1)."""
    F = 32
    data = rng.normal(size=(B, 1, F, 128)).astype(np.float32)
    frames = make_frames(rng, B, 128, min_seg=5, max_seg=20)
    mix = rng.permutation(B)
    lam = 0.25
    pieces = segment_blend_pieces(
        frames, frames[mix], np.zeros((B, 4), np.int64), np.full((B, 4), lam, np.float32)
    )
    out = np.asarray(
        piecewise_mix_batch(
            jnp.asarray(data),
            jnp.asarray(mix),
            jnp.asarray(pieces["dst_start"]),
            jnp.asarray(pieces["src_start"]),
            jnp.asarray(pieces["length"]),
            jnp.asarray(pieces["src_sel"]),
            jnp.asarray(pieces["alpha"], jnp.float32),
        )
    )
    for i in range(B):
        exp = mixup_keepdur_oracle(data[i], data[mix[i]], frames[i], frames[mix[i]], lam)
        np.testing.assert_allclose(out[i], exp, rtol=1e-6, atol=1e-6)
