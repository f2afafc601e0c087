"""Spline-warp kernels vs scipy CubicSpline oracles."""

import numpy as np
import jax.numpy as jnp

from pcgmix_tpu.ops import magnitude_warp, time_warp

from .oracles import magnitude_warp_oracle, time_warp_oracle

B, C, T = 4, 4, 1024


def test_magnitude_warp_matches_scipy(rng):
    x = rng.normal(size=(B, C, T)).astype(np.float32)
    knots = rng.normal(1.0, 0.2, size=(B, 6, C)).astype(np.float32)
    out = np.asarray(magnitude_warp(jnp.asarray(x), jnp.asarray(knots)))
    exp = magnitude_warp_oracle(
        np.transpose(x, (0, 2, 1)), 0.2, 4, knots=knots
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(out, exp, rtol=2e-4, atol=2e-5)


def test_time_warp_matches_scipy(rng):
    x = rng.normal(size=(4, 2, 500)).astype(np.float32)
    knots = rng.normal(1.0, 0.05, size=(4, 6, 2)).astype(np.float32)
    out = np.asarray(time_warp(jnp.asarray(x), jnp.asarray(knots)))
    exp = time_warp_oracle(
        np.transpose(x, (0, 2, 1)), 0.05, 4, knots=knots
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(out, exp, rtol=5e-3, atol=5e-3)


def test_magnitude_warp_identity_knots(rng):
    x = rng.normal(size=(2, 1, 300)).astype(np.float32)
    knots = np.ones((2, 6, 1), np.float32)
    out = np.asarray(magnitude_warp(jnp.asarray(x), jnp.asarray(knots)))
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)
