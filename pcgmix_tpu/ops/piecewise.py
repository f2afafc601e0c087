"""The piecewise-mix kernel: one masked-gather op for all segment surgery.

Every cardiac-cycle augmentation in the reference is, per sample, a set of
non-overlapping "pieces": copy-or-blend a window of a source signal (itself
or a mixing partner) into a window of the output.  The reference realizes
these as per-sample Python slice assignments inside the batch loop
(augmentations.py:289-338 ``mixup_keepdur_multidim_tensors``, :340-366
``cutmix_keepdur_multidim_tensors``, :30-58 ``cutmix_multidim_tensors``,
:1335-1346 swapsysdia, :1420-1463 saliency-cutmix, :1375-1383 cont-cutmix).

Here a piece list is a fixed-size (K,) set of integer arrays and the whole
batch transform is a single vmapped expression with static shapes:

    out[t] = base[t]                                     if t uncovered
    out[t] = a_k * base[t] + (1 - a_k) * src_k[t + off_k]  if t in piece k

with ``src_k`` selecting between the sample itself (d1) and its mixing
partner (d2).  Unused piece slots are encoded with ``length == 0``.

This maps well onto TPU: the time axis (2500) is the lane dimension, masks
and selects are VPU work, and the only gather is a 1-D gather along time
that XLA lowers to a dynamic-slice-free gather; everything fuses into the
surrounding train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def piecewise_mix(
    d1: jax.Array,
    d2: jax.Array,
    dst_start: jax.Array,
    src_start: jax.Array,
    length: jax.Array,
    src_sel: jax.Array,
    alpha: jax.Array,
    *,
    base_is_d1: bool = True,
) -> jax.Array:
    """Apply K non-overlapping pieces to a single sample.

    Args:
      d1: (..., T) the sample (any leading channel/frequency dims).
      d2: (..., T) the mixing partner (same shape).
      dst_start: (K,) int32 output window starts.
      src_start: (K,) int32 source window starts.
      length: (K,) int32 window lengths (0 disables a slot).
      src_sel: (K,) int32 — 0 reads from d1, 1 reads from d2.
      alpha: (K,) float — out = alpha*base + (1-alpha)*src inside the piece.
             alpha=0 is a plain copy, alpha=λ is the PCGmix blend.
      base_is_d1: when True the uncovered output equals d1 (keep-duration
        methods clone d1 first, augmentations.py:290); when False the
        uncovered output is 0 (concat-style methods allocate zeros,
        augmentations.py:36).

    Returns:
      (..., T) mixed sample.
    """
    T = d1.shape[-1]
    t = jnp.arange(T, dtype=jnp.int32)
    dst_start = dst_start.astype(jnp.int32)
    src_start = src_start.astype(jnp.int32)
    length = length.astype(jnp.int32)

    # (K, T) membership masks; pieces are disjoint by construction.
    inside = (t[None, :] >= dst_start[:, None]) & (
        t[None, :] < (dst_start + length)[:, None]
    )
    insidef = inside.astype(d1.dtype)
    covered = inside.any(axis=0)
    a = jnp.einsum("kt,k->t", insidef, alpha.astype(d1.dtype))
    off = jnp.sum(jnp.where(inside, (src_start - dst_start)[:, None], 0), axis=0)
    sel = jnp.sum(jnp.where(inside, src_sel.astype(jnp.int32)[:, None], 0), axis=0)

    idx = jnp.clip(t + off, 0, T - 1)
    g1 = jnp.take(d1, idx, axis=-1)
    g2 = jnp.take(d2, idx, axis=-1)
    src = jnp.where(sel.astype(bool), g2, g1)

    base = d1 if base_is_d1 else jnp.zeros_like(d1)
    return jnp.where(covered, a * base + (1.0 - a) * src, base)


@functools.partial(jax.jit, static_argnames=("base_is_d1",))
def piecewise_mix_batch(
    data: jax.Array,
    mix_indices: jax.Array,
    dst_start: jax.Array,
    src_start: jax.Array,
    length: jax.Array,
    src_sel: jax.Array,
    alpha: jax.Array,
    *,
    base_is_d1: bool = True,
) -> jax.Array:
    """Batched piecewise mix.

    Args:
      data: (B, ..., T) batch.
      mix_indices: (B,) partner index per sample (d2 = data[mix_indices]).
      dst_start/src_start/length/src_sel/alpha: (B, K) per-sample pieces.

    Returns:
      (B, ..., T) mixed batch.
    """
    d2 = jnp.take(data, mix_indices.astype(jnp.int32), axis=0)
    fn = functools.partial(piecewise_mix, base_is_d1=base_is_d1)
    return jax.vmap(fn)(data, d2, dst_start, src_start, length, src_sel, alpha)


@functools.partial(jax.jit, static_argnames=("base_is_d1",))
def piecewise_mix_pairs(
    data: jax.Array,
    idx1: jax.Array,
    idx2: jax.Array,
    dst_start: jax.Array,
    src_start: jax.Array,
    length: jax.Array,
    src_sel: jax.Array,
    alpha: jax.Array,
    *,
    base_is_d1: bool = True,
) -> jax.Array:
    """Piecewise mix over explicit index pairs: output row i mixes
    data[idx1[i]] with data[idx2[i]].  Output batch = len(idx1), which may
    exceed the input batch (the lc-nointrusion 4× candidate pool,
    augmentations.py:1236-1258)."""
    d1 = jnp.take(data, idx1.astype(jnp.int32), axis=0)
    d2 = jnp.take(data, idx2.astype(jnp.int32), axis=0)
    fn = functools.partial(piecewise_mix, base_is_d1=base_is_d1)
    return jax.vmap(fn)(d1, d2, dst_start, src_start, length, src_sel, alpha)


def segment_blend_pieces(frames1, frames2, disp, lam_seg):
    """Build the (K=4,) piece arrays for keep-duration segment blending.

    Vectorized (NumPy or JAX) translation of the slice arithmetic in
    ``mixup_keepdur_multidim_tensors`` (augmentations.py:289-338) and
    ``cutmix_keepdur_multidim_tensors`` (:340-366):

      - per segment k, L_k = min(len1_k, len2_k)
      - the *longer* side's window is displaced by disp_k in [0, |gap_k|]
        ((rand) / (salopt…) variants; 0 otherwise)
      - out[dst_k : dst_k+L_k] = lam_seg_k * d1[...] + (1-lam_seg_k) * d2[...]

    Args:
      frames1: (..., 5) segment boundaries of d1.
      frames2: (..., 5) segment boundaries of d2.
      disp: (..., 4) displacement of the longer side per segment.
      lam_seg: (..., 4) per-segment blend coefficient on d1.

    Returns:
      dict of (..., 4) arrays: dst_start, src_start, length, src_sel, alpha.
      src_sel is always 1 (read from d2); alpha is lam_seg.
    """
    xp = jnp if isinstance(frames1, jnp.ndarray) else __import__("numpy")
    len1 = frames1[..., 1:] - frames1[..., :-1]
    len2 = frames2[..., 1:] - frames2[..., :-1]
    length = xp.minimum(len1, len2)
    gap = len2 - len1  # >=0: d2 longer -> displace src; <0: d1 longer -> dst
    dst_start = frames1[..., :-1] + xp.where(gap < 0, disp, 0)
    src_start = frames2[..., :-1] + xp.where(gap >= 0, disp, 0)
    return {
        "dst_start": dst_start,
        "src_start": src_start,
        "length": length,
        "src_sel": xp.ones_like(length),
        "alpha": lam_seg,
    }
