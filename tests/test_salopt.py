"""Saliency-optimal displacement search vs literal reference-style scans."""

import numpy as np
import pytest

from pcgmix_tpu.augment.salopt import (
    optimal_displacement_max_envelope,
    optimal_displacement_max_sum,
    salopt_displacements,
)


def brute_env(s1, s2):
    """Literal displacement scan for the max-envelope objective
    (augmentations.py:60-93 semantics)."""
    n1, n2 = len(s1), len(s2)
    if n1 > n2:
        best, bd = -np.inf, 0
        for d in range(n1 - n2 + 1):
            cur = s1[:d].sum() + np.maximum(s1[d:d + n2], s2).sum() + s1[d + n2:].sum()
            if cur > best:
                best, bd = cur, d
        return bd
    best, bd = -np.inf, 0
    for d in range(n2 - n1 + 1):
        cur = np.maximum(s2[d:d + n1], s1).sum()
        if cur > best:
            best, bd = cur, d
    return bd


def brute_sum(s1, s2, lam):
    """Literal scan for the λ-blend objective (augmentations.py:95-128)."""
    n1, n2 = len(s1), len(s2)
    if n1 > n2:
        best, bd = -np.inf, 0
        for d in range(n1 - n2 + 1):
            cur = (s1[:d].sum() + (s1[d:d + n2] * lam + s2 * (1 - lam)).sum()
                   + s1[d + n2:].sum())
            if cur > best:
                best, bd = cur, d
        return bd
    best, bd = -np.inf, 0
    for d in range(n2 - n1 + 1):
        cur = (s1 * lam + s2[d:d + n1] * (1 - lam)).sum()
        if cur > best:
            best, bd = cur, d
    return bd


@pytest.mark.parametrize("n1,n2", [(120, 40), (40, 120), (75, 74), (10, 60)])
def test_env_matches_brute_force(rng, n1, n2):
    for _ in range(5):
        s1, s2 = rng.random(n1), rng.random(n2)
        assert optimal_displacement_max_envelope(s1, s2, 0.4) == brute_env(s1, s2)


@pytest.mark.parametrize("n1,n2", [(120, 40), (40, 120), (10, 60)])
def test_sum_matches_brute_force(rng, n1, n2):
    for lam in (0.2, 0.7):
        s1, s2 = rng.random(n1), rng.random(n2)
        assert optimal_displacement_max_sum(s1, s2, lam) == brute_sum(s1, s2, lam)


def test_batch_displacements_in_range(rng):
    from .conftest import make_frames

    B, T = 6, 512
    sal = rng.random((B, T))
    frames = make_frames(rng, B, T, min_seg=10, max_seg=60)
    mix = rng.permutation(B)
    disp = salopt_displacements(sal, frames, mix, 0.5, "env")
    len1 = frames[:, 1:] - frames[:, :-1]
    len2 = frames[mix][:, 1:] - frames[mix][:, :-1]
    gap = np.abs(len2 - len1)
    assert np.all(disp >= 0) and np.all(disp <= gap)
    # equal-length segments never displace
    assert np.all(disp[gap == 0] == 0)
