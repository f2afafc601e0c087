"""Cubic-spline warps (magnitude_warp / time_warp) as MXU matmuls.

The reference evaluates ``scipy.interpolate.CubicSpline`` per sample per
channel on the CPU inside the training step — its single slowest path
(augmentations.py:674-696, :924-928).  A natural cubic spline with *fixed*
knot positions is linear in the knot values, so we precompute the dense
(T, knot+2) evaluation basis once (exactly, via scipy's not-a-knot solve on
unit vectors) and evaluate the whole batch's warpers with one matmul:

    warper[b, c, t] = sum_k  S[t, k] * knots[b, k, c]

which is bit-identical to per-sample CubicSpline evaluation (linearity) and
runs on the MXU at full speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def cubic_spline_basis(sig_len: int, knot: int) -> np.ndarray:
    """Dense evaluation basis of a not-a-knot cubic spline.

    Knot positions are ``linspace(0, sig_len-1, knot+2)`` and queries are
    ``arange(sig_len)``, matching magnitude_warp/time_warp
    (augmentations.py:676-681).  Returns float64 (T, knot+2); cast at the
    call site.  Built with scipy's CubicSpline so boundary conditions match
    the reference exactly.
    """
    from scipy.interpolate import CubicSpline

    steps = np.linspace(0, sig_len - 1.0, num=knot + 2)
    queries = np.arange(sig_len, dtype=np.float64)
    basis = np.empty((sig_len, knot + 2), dtype=np.float64)
    for k in range(knot + 2):
        unit = np.zeros(knot + 2)
        unit[k] = 1.0
        basis[:, k] = CubicSpline(steps, unit)(queries)
    return basis


@jax.jit
def _apply_mag_warp(x: jax.Array, basis: jax.Array, knots: jax.Array) -> jax.Array:
    # Precision.HIGHEST: on TPU, fp32 contractions default to bf16 passes;
    # full fp32 is required for scipy-parity and costs nothing here (the
    # contraction dim is knot+2 ≈ 6).
    warper = jnp.einsum(
        "tk,bkc->bct", basis, knots, precision=jax.lax.Precision.HIGHEST
    )
    return x * warper


def magnitude_warp(x: jax.Array, knots: jax.Array) -> jax.Array:
    """Multiply each (sample, channel) by a smooth random envelope.

    Args:
      x: (B, C, T) batch.
      knots: (B, knot+2, C) spline knot values (typically ~N(1, σ²),
        augmentations.py:677).

    Returns:
      (B, C, T) warped batch.  Equivalent to the reference magnitude_warp
      (augmentations.py:674-683) applied in (B, T, C) layout.
    """
    basis = jnp.asarray(
        cubic_spline_basis(x.shape[-1], knots.shape[1] - 2), dtype=x.dtype
    )
    return _apply_mag_warp(x, basis, knots.astype(x.dtype))


@jax.jit
def _apply_time_warp(x: jax.Array, basis: jax.Array, scaled_steps: jax.Array):
    sig_len = x.shape[-1]
    # (B, C, T) warped time coordinates.
    tw = jnp.einsum(
        "tk,bkc->bct", basis, scaled_steps, precision=jax.lax.Precision.HIGHEST
    )
    scale = (sig_len - 1.0) / tw[..., -1:]
    pos = jnp.clip(scale * tw, 0.0, sig_len - 1.0)
    queries = jnp.arange(sig_len, dtype=x.dtype)

    def interp_1d(p, sig):
        y = jnp.interp(queries, p, sig)
        # np.interp boundary semantics: for duplicate positions at the HEAD
        # (clipping to 0) both np and jnp return the last duplicate's value;
        # at the TAIL np returns the final sample while jnp returns the first
        # of the trailing duplicates — patch the tail only.
        return jnp.where(queries >= p[-1], sig[-1], y)

    return jax.vmap(jax.vmap(interp_1d))(pos, x)


def time_warp(x: jax.Array, knots: jax.Array) -> jax.Array:
    """Smoothly warp the time axis of each (sample, channel).

    Mirrors the reference time_warp (augmentations.py:685-696): the warped
    time curve is the cubic spline through ``warp_steps * knots`` rescaled so
    its endpoint is T-1, and the signal is linearly re-interpolated at the
    original grid.

    Args:
      x: (B, C, T) batch.
      knots: (B, knot+2, C) multiplicative knot values (~N(1, σ²)).
    """
    sig_len = x.shape[-1]
    knot = knots.shape[1] - 2
    basis = jnp.asarray(cubic_spline_basis(sig_len, knot), dtype=x.dtype)
    warp_steps = jnp.asarray(
        np.linspace(0, sig_len - 1.0, num=knot + 2), dtype=x.dtype
    )
    scaled = knots.astype(x.dtype) * warp_steps[None, :, None]
    return _apply_time_warp(x, basis, scaled)
