"""Fused PCGmix+ kernel vs the two-stage XLA path (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from pcgmix_tpu.ops import magnitude_warp, piecewise_mix_batch, segment_blend_pieces
from pcgmix_tpu.ops.pallas_mix import pcgmix_plus_fused_pallas

from .conftest import make_frames


def test_fused_matches_two_stage(rng):
    B, C, T = 6, 4, 512
    data = rng.normal(size=(B, C, T)).astype(np.float32)
    frames = make_frames(rng, B, T, min_seg=10, max_seg=60)
    mix = rng.permutation(B)
    pieces = segment_blend_pieces(
        frames, frames[mix], np.zeros((B, 4), np.int64),
        np.full((B, 4), 0.3, np.float32),
    )
    knots = rng.normal(1.0, 0.2, size=(B, 6, C)).astype(np.float32)
    args = (jnp.asarray(data), jnp.asarray(mix), jnp.asarray(pieces["dst_start"]),
            jnp.asarray(pieces["src_start"]), jnp.asarray(pieces["length"]),
            jnp.asarray(pieces["src_sel"]),
            jnp.asarray(pieces["alpha"], jnp.float32))
    ref = np.asarray(magnitude_warp(piecewise_mix_batch(*args), jnp.asarray(knots)))
    fused = np.asarray(
        pcgmix_plus_fused_pallas(*args, jnp.asarray(knots), interpret=True)
    )
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-6)
