"""Pallas TPU kernel for the piecewise segment mix.

The XLA lowering of :func:`pcgmix_tpu.ops.piecewise.piecewise_mix_batch`
materializes two full-length gathers per sample.  This kernel instead keeps
each (C, T) sample row in VMEM and realizes the per-segment source windows
as dynamic lane rotations (``pltpu.roll``) combined on the VPU — no gather,
one pass over the row.  The partner row is fetched directly by the
scalar-prefetched pair index driving the second input's index map, so the
kernel reads exactly 2 rows per output row from HBM.

Semantics are identical to piecewise_mix (verified against it in tests):

    out[t] = base[t]                                      t uncovered
    out[t] = a_k·base[t] + (1−a_k)·src_k[t + off_k]       t in piece k
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mix_body(n_pieces: int, base_is_d1: bool, i,
              dst_ref, src_ref, len_ref, sel_ref, alpha_ref, d1, d2):
    """Shared piecewise blend: per-piece source windows realized as dynamic
    lane rotations over VMEM rows."""
    C, T = d1.shape
    t = jax.lax.broadcasted_iota(jnp.int32, (C, T), 1)
    base = d1 if base_is_d1 else jnp.zeros_like(d1)
    out = base
    for k in range(n_pieces):  # static unroll: K is 2..14
        dst = dst_ref[i, k]
        off = src_ref[i, k] - dst
        length = len_ref[i, k]
        a = alpha_ref[i, k]
        # source window aligned to the output window via ONE lane rotation
        # (sel is scalar, so select-then-rotate); normalize the shift to
        # [0, T) — Mosaic's dynamic rotate mishandles negative amounts
        shift = jnp.mod(-off, T)
        srcv = pltpu.roll(jnp.where(sel_ref[i, k] > 0, d2, d1), shift, axis=1)
        inside = (t >= dst) & (t < dst + length)
        # blend against the same base as piecewise_mix (zeros for concat)
        out = jnp.where(inside, a * base + (1.0 - a) * srcv, out)
    return out


def _kernel(n_pieces: int, base_is_d1: bool,
            idx1_ref, idx2_ref, dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
            d1_ref, d2_ref, out_ref):
    i = pl.program_id(0)
    out = _mix_body(n_pieces, base_is_d1, i,
                    dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
                    d1_ref[0], d2_ref[0])
    # fp32 alpha promotes bf16 rows; cast back (bf16 batches are legal input)
    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_prepaired(n_pieces: int, base_is_d1: bool,
                      dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
                      d1_ref, d2_ref, out_ref):
    i = pl.program_id(0)
    out = _mix_body(n_pieces, base_is_d1, i,
                    dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
                    d1_ref[0], d2_ref[0])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("base_is_d1", "interpret"))
def piecewise_mix_pairs_pallas(
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
    interpret: bool = False,
) -> jax.Array:
    """Pallas piecewise mix over explicit row pairs: output row i mixes
    data[idx1[i]] with data[idx2[i]] (output batch = len(idx1)).

    Mosaic's dynamic lane rotation needs (8, 128)-aligned tiles, so rows are
    zero-padded to (8·⌈C/8⌉, 128·⌈T/128⌉) around the kernel; piece masks only
    ever cover real positions, so the wrap-around garbage in the padding is
    never selected.
    """
    B, C, T = data.shape
    N = idx1.shape[0]
    cpad = (-C) % 8
    tpad = (-T) % 128
    if cpad or tpad:
        padded = jnp.pad(data, ((0, 0), (0, cpad), (0, tpad)))
        out = piecewise_mix_pairs_pallas(
            padded, idx1, idx2, dst_start, src_start, length, src_sel, alpha,
            base_is_d1=base_is_d1, interpret=interpret,
        )
        return out[:, :C, :T]
    K = dst_start.shape[1]
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, T), lambda i, idx1, *s: (idx1[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, T), lambda i, idx1, idx2, *s: (idx2[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, K, base_is_d1),
        out_shape=jax.ShapeDtypeStruct((N, C, T), data.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        # alpha stays fp32 even for bf16 batches: in-kernel `a*d1` promotes
        # the blend to fp32, and the out_ref write casts back
        i32(idx1), i32(idx2), i32(dst_start), i32(src_start), i32(length),
        i32(src_sel), jnp.asarray(alpha, jnp.float32), data, data,
    )


def piecewise_mix_batch_pallas(
    data, mix_indices, dst_start, src_start, length, src_sel, alpha,
    *, base_is_d1: bool = True, interpret: bool = False,
):
    """Pallas counterpart of piecewise_mix_batch (idx1 = identity)."""
    idx1 = jnp.arange(data.shape[0], dtype=jnp.int32)
    return piecewise_mix_pairs_pallas(
        data, idx1, mix_indices, dst_start, src_start, length, src_sel, alpha,
        base_is_d1=base_is_d1, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("base_is_d1", "interpret"))
def piecewise_mix_prepaired_pallas(
    d1_rows: jax.Array,
    d2_rows: jax.Array,
    dst_start: jax.Array,
    src_start: jax.Array,
    length: jax.Array,
    src_sel: jax.Array,
    alpha: jax.Array,
    *,
    base_is_d1: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Piecewise mix over rows whose partners were already gathered: output
    row i mixes d1_rows[i] with d2_rows[i].

    This is the mesh-compatible entry: under a data-parallel mesh the pair
    gather may cross shards, so the trainer gathers partners with an XLA
    ``jnp.take`` (GSPMD inserts the collective) and then shard_maps this
    kernel with shard-local rows — the opaque pallas_call never sees a
    cross-shard index (ROADMAP round-2 item; nn.DataParallel subsumption,
    train_model.py:385).
    """
    N, C, T = d1_rows.shape
    cpad = (-C) % 8
    tpad = (-T) % 128
    if cpad or tpad:
        pad = ((0, 0), (0, cpad), (0, tpad))
        out = piecewise_mix_prepaired_pallas(
            jnp.pad(d1_rows, pad), jnp.pad(d2_rows, pad),
            dst_start, src_start, length, src_sel, alpha,
            base_is_d1=base_is_d1, interpret=interpret,
        )
        return out[:, :C, :T]
    K = dst_start.shape[1]
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel_prepaired, K, base_is_d1),
        out_shape=jax.ShapeDtypeStruct((N, C, T), d1_rows.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        i32(dst_start), i32(src_start), i32(length), i32(src_sel),
        jnp.asarray(alpha, jnp.float32), d1_rows, d2_rows,
    )


# --------------------------------------------------------------------------- #
# Fully-fused PCGmix+ kernel: pair gather + segment blend + magnitude warp
# --------------------------------------------------------------------------- #


def _fused_epilogue(out, knots_ref, basis_ref, out_ref):
    # magnitude warp: warper (T, C) = basis (T, K2) @ knots (K2, C) on the
    # MXU; HIGHEST keeps the fp32 spline exact (scipy parity)
    warper = jnp.dot(basis_ref[...], knots_ref[0],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    # the fp32 spline product is cast back to the ref dtype (bf16 inputs are
    # legal: engine.apply may be called on an already-downcast batch)
    out_ref[0] = (out * warper.T).astype(out_ref.dtype)


def _kernel_fused(n_pieces: int,
                  mix_ref, dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
                  d1_ref, d2_ref, knots_ref, basis_ref, out_ref):
    i = pl.program_id(0)
    out = _mix_body(n_pieces, True, i,
                    dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
                    d1_ref[0], d2_ref[0])
    _fused_epilogue(out, knots_ref, basis_ref, out_ref)


def _kernel_fused_prepaired(n_pieces: int,
                            dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
                            d1_ref, d2_ref, knots_ref, basis_ref, out_ref):
    i = pl.program_id(0)
    out = _mix_body(n_pieces, True, i,
                    dst_ref, src_ref, len_ref, sel_ref, alpha_ref,
                    d1_ref[0], d2_ref[0])
    _fused_epilogue(out, knots_ref, basis_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pcgmix_plus_fused_pallas(
    data: jax.Array,
    mix_indices: jax.Array,
    dst_start: jax.Array,
    src_start: jax.Array,
    length: jax.Array,
    src_sel: jax.Array,
    alpha: jax.Array,
    knots: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """One kernel for the whole durmixmagwarp augment (augmentations.py:
    864-929 semantics): per output row, fetch the sample and its partner,
    blend the four cardiac segments via lane rotations, and multiply by the
    cubic-spline magnitude envelope evaluated as a basis×knots matmul.

    data (B, C, T); knots (B, knot+2, C); basis comes from
    ops.spline.cubic_spline_basis (linearity makes this exact vs scipy).
    """
    from pcgmix_tpu.ops.spline import cubic_spline_basis

    B, C, T = data.shape
    K2 = knots.shape[1]
    cpad = (-C) % 8
    tpad = (-T) % 128
    kpad = (-K2) % 8
    # basis/knots stay fp32 even for bf16 batches — the spline product runs
    # in fp32 on the MXU and only the out_ref write casts down
    basis = np.asarray(cubic_spline_basis(T, K2 - 2), dtype=np.float32)
    if cpad or tpad or kpad:
        padded = jnp.pad(data, ((0, 0), (0, cpad), (0, tpad)))
        knots_p = jnp.pad(knots, ((0, 0), (0, kpad), (0, cpad)))
        out = _fused_call(
            padded, mix_indices, dst_start, src_start, length, src_sel, alpha,
            knots_p,
            jnp.pad(jnp.asarray(basis), ((0, tpad), (0, kpad))),
            interpret,
        )
        return out[:, :C, :T]
    return _fused_call(
        data, mix_indices, dst_start, src_start, length, src_sel, alpha,
        knots, jnp.asarray(basis), interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pcgmix_plus_fused_prepaired_pallas(
    d1_rows: jax.Array,
    d2_rows: jax.Array,
    dst_start: jax.Array,
    src_start: jax.Array,
    length: jax.Array,
    src_sel: jax.Array,
    alpha: jax.Array,
    knots: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Mesh-compatible fused PCGmix+ kernel: partners pre-gathered (see
    piecewise_mix_prepaired_pallas), segment blend + spline warp fused."""
    from pcgmix_tpu.ops.spline import cubic_spline_basis

    N, C, T = d1_rows.shape
    K2 = knots.shape[1]
    cpad = (-C) % 8
    tpad = (-T) % 128
    kpad = (-K2) % 8
    basis = np.asarray(cubic_spline_basis(T, K2 - 2), dtype=np.float32)
    if cpad or tpad or kpad:
        pad = ((0, 0), (0, cpad), (0, tpad))
        out = _fused_prepaired_call(
            jnp.pad(d1_rows, pad), jnp.pad(d2_rows, pad),
            dst_start, src_start, length, src_sel, alpha,
            jnp.pad(knots, ((0, 0), (0, kpad), (0, cpad))),
            jnp.pad(jnp.asarray(basis), ((0, tpad), (0, kpad))),
            interpret,
        )
        return out[:, :C, :T]
    return _fused_prepaired_call(
        d1_rows, d2_rows, dst_start, src_start, length, src_sel, alpha,
        knots, jnp.asarray(basis), interpret,
    )


def _fused_prepaired_call(d1_rows, d2_rows, dst, src, length, sel, alpha,
                          knots, basis, interpret):
    N, C, T = d1_rows.shape
    K2 = knots.shape[1]
    K = dst.shape[1]
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2, C), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, K2), lambda i, *s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel_fused_prepaired, K),
        out_shape=jax.ShapeDtypeStruct(d1_rows.shape, d1_rows.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        i32(dst), i32(src), i32(length), i32(sel),
        jnp.asarray(alpha, jnp.float32), d1_rows, d2_rows,
        jnp.asarray(knots, jnp.float32), jnp.asarray(basis, jnp.float32),
    )


def _fused_call(data, mix, dst, src, length, sel, alpha, knots, basis,
                interpret):
    B, C, T = data.shape
    K2 = knots.shape[1]
    K = dst.shape[1]
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, T), lambda i, mixr, *s: (mixr[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2, C), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, K2), lambda i, *s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, T), lambda i, *s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel_fused, K),
        out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        i32(mix), i32(dst), i32(src), i32(length), i32(sel),
        jnp.asarray(alpha, jnp.float32), data, data,
        jnp.asarray(knots, jnp.float32), jnp.asarray(basis, jnp.float32),
    )
