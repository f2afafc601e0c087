"""Pallas piecewise-mix kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from pcgmix_tpu.ops import piecewise_mix_batch, segment_blend_pieces
from pcgmix_tpu.ops.pallas_mix import piecewise_mix_batch_pallas

from .conftest import make_frames

B, C, T = 8, 4, 512


def _inputs(rng, lam):
    data = rng.normal(size=(B, C, T)).astype(np.float32)
    frames = make_frames(rng, B, T, min_seg=10, max_seg=60)
    mix = rng.permutation(B)
    pieces = segment_blend_pieces(
        frames, frames[mix], np.zeros((B, 4), np.int64),
        np.full((B, 4), lam, np.float32),
    )
    return data, mix, pieces


def test_pallas_matches_xla_blend(rng):
    data, mix, p = _inputs(rng, 0.3)
    args = (jnp.asarray(data), jnp.asarray(mix), jnp.asarray(p["dst_start"]),
            jnp.asarray(p["src_start"]), jnp.asarray(p["length"]),
            jnp.asarray(p["src_sel"]), jnp.asarray(p["alpha"], jnp.float32))
    ref = np.asarray(piecewise_mix_batch(*args))
    pal = np.asarray(piecewise_mix_batch_pallas(*args, interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-6, atol=1e-6)


def test_pallas_matches_xla_concat_base_zero(rng):
    data, mix, _ = _inputs(rng, 0.0)
    frames = make_frames(rng, B, T, min_seg=10, max_seg=60)
    c1 = frames[:, 2]
    f2 = frames[mix]
    last = np.minimum(c1 + f2[:, -1] - f2[:, 2], T)
    dst = np.stack([np.zeros(B, np.int64), c1], 1)
    src = np.stack([np.zeros(B, np.int64), f2[:, 2]], 1)
    ln = np.stack([c1, last - c1], 1)
    sel = np.stack([np.zeros(B, np.int64), np.ones(B, np.int64)], 1)
    alpha = np.zeros((B, 2), np.float32)
    args = tuple(jnp.asarray(x) for x in (data, mix, dst, src, ln, sel, alpha))
    ref = np.asarray(piecewise_mix_batch(*args, base_is_d1=False))
    pal = np.asarray(
        piecewise_mix_batch_pallas(*args, base_is_d1=False, interpret=True)
    )
    np.testing.assert_allclose(pal, ref, rtol=1e-6, atol=1e-6)


def test_pallas_bf16_batch(rng):
    """bf16 batches are legal input: the fp32 alpha/spline math must cast
    back at the out_ref write instead of crashing (regression: dtype `swap`
    mismatch when engine.apply runs on an already-downcast batch)."""
    from pcgmix_tpu.ops.pallas_mix import pcgmix_plus_fused_pallas

    data, mix, p = _inputs(rng, 0.3)
    bf = jnp.asarray(data, jnp.bfloat16)
    args = (bf, jnp.asarray(mix), jnp.asarray(p["dst_start"]),
            jnp.asarray(p["src_start"]), jnp.asarray(p["length"]),
            jnp.asarray(p["src_sel"]), jnp.asarray(p["alpha"], jnp.float32))
    out = piecewise_mix_batch_pallas(*args, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(piecewise_mix_batch(
        jnp.asarray(data), *args[1:])).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-2)

    knots = jnp.asarray(rng.normal(1.0, 0.2, size=(B, 6, C)), jnp.float32)
    fused = pcgmix_plus_fused_pallas(*args, knots, interpret=True)
    assert fused.dtype == jnp.bfloat16


def test_pallas_concat_base_zero_nonzero_alpha(rng):
    """base_is_d1=False with alpha>0 must blend against the ZERO base like
    piecewise_mix (regression: the kernel blended against d1)."""
    data, mix, p = _inputs(rng, 0.35)
    alpha = np.full_like(p["alpha"], 0.3)
    args = (jnp.asarray(data), jnp.asarray(mix), jnp.asarray(p["dst_start"]),
            jnp.asarray(p["src_start"]), jnp.asarray(p["length"]),
            jnp.asarray(p["src_sel"]), jnp.asarray(alpha, jnp.float32))
    pal = np.asarray(
        piecewise_mix_batch_pallas(*args, base_is_d1=False, interpret=True)
    )
    ref = np.asarray(piecewise_mix_batch(*args, base_is_d1=False))
    np.testing.assert_allclose(pal, ref, rtol=1e-6, atol=1e-6)
