"""Conv+BN-stats Pallas megakernel: measure the payoff bound (BENCH.md's
one remaining untried perf lever).

The step-time trace attributes ~37% of device time to convs and ~27% to
BN statistics (bandwidth-bound reads of the conv output).  A fused
conv+stats kernel would save exactly one HBM read of each conv output.
Before building the full megakernel (which would also need a custom
backward), this microbench bounds the payoff on the two FLOP-dominant
ResNet9 block shapes (models/resnet9.py: res2a 64x312x512->512 and
conv3 64x1250x128->256, k=3, 'same' padding — together ~60% of the
model's conv FLOPs):

  xla_conv        lax conv, bf16 (the model's own lowering)
  xla_conv_stats  conv + fp32 sum/sumsq over (B,T) — what BN training adds
  pallas_conv     conv as 3 shifted MXU matmuls, one kernel
  pallas_fused    same kernel + in-VMEM stats accumulation (the megakernel
                  forward: stats cost zero extra HBM traffic)

Decision rule: if pallas_fused cannot beat xla_conv_stats, the megakernel
is dead (its best case is already losing on the forward; the backward
only gets harder).  Run on the real chip, ONE process, median windows,
trailing control for tunnel drift.

Usage: python scripts/bench_conv_bn_fused.py [--windows N] [--check]
"""

from __future__ import annotations

import argparse
import functools
import json
import statistics
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench_fused {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def make_arms(B, T, Cin, Cout, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def _kernel(with_stats, x_ref, w_ref, y_ref, s1_ref, s2_ref):
        g = pl.program_id(0)
        xv = x_ref[0]                       # (T, Cin) bf16
        w = w_ref[...]                      # (3, Cin, Cout) bf16
        zrow = jnp.zeros((1, Cin), xv.dtype)
        # k=3 'same' conv == 3 shifted matmuls; the shifted copies get a
        # zero row at the boundary (the per-sample zero padding).  Static
        # pad+slice, not pltpu.roll — Mosaic's rotate rejects bf16.
        acc = jnp.dot(xv, w[1], preferred_element_type=jnp.float32)
        prev = jnp.concatenate([zrow, xv[:T - 1]], axis=0)
        acc += jnp.dot(prev, w[0], preferred_element_type=jnp.float32)
        nxt = jnp.concatenate([xv[1:], zrow], axis=0)
        acc += jnp.dot(nxt, w[2], preferred_element_type=jnp.float32)
        y_ref[0] = acc.astype(y_ref.dtype)
        if with_stats:
            @pl.when(g == 0)
            def _init():
                s1_ref[...] = jnp.zeros_like(s1_ref)
                s2_ref[...] = jnp.zeros_like(s2_ref)
            s1_ref[...] += jnp.sum(acc, axis=0, keepdims=True)
            s2_ref[...] += jnp.sum(acc * acc, axis=0, keepdims=True)

    def _kernel_flat(with_stats, S, x_ref, w_ref, y_ref, s1_ref, s2_ref):
        """S samples flattened into one (S*T, Cin) block: one big matmul
        per tap; rows that crossed a sample boundary in the shift are
        zeroed (they correspond to the per-sample zero padding)."""
        g = pl.program_id(0)
        M = S * T
        xv = x_ref[...]                     # (M, Cin) bf16
        w = w_ref[...]
        row = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
        zrow = jnp.zeros((1, Cin), xv.dtype)
        acc = jnp.dot(xv, w[1], preferred_element_type=jnp.float32)
        prev = jnp.where(row % T == 0, jnp.zeros((), xv.dtype),
                         jnp.concatenate([zrow, xv[:M - 1]], axis=0))
        acc += jnp.dot(prev, w[0], preferred_element_type=jnp.float32)
        nxt = jnp.where(row % T == T - 1, jnp.zeros((), xv.dtype),
                        jnp.concatenate([xv[1:], zrow], axis=0))
        acc += jnp.dot(nxt, w[2], preferred_element_type=jnp.float32)
        y_ref[...] = acc.astype(y_ref.dtype)
        if with_stats:
            @pl.when(g == 0)
            def _init():
                s1_ref[...] = jnp.zeros_like(s1_ref)
                s2_ref[...] = jnp.zeros_like(s2_ref)
            s1_ref[...] += jnp.sum(acc, axis=0, keepdims=True)
            s2_ref[...] += jnp.sum(acc * acc, axis=0, keepdims=True)

    def pallas_call(with_stats):
        return pl.pallas_call(
            functools.partial(_kernel, with_stats),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, T, Cin), lambda g: (g, 0, 0)),
                pl.BlockSpec((3, Cin, Cout), lambda g: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, T, Cout), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, Cout), lambda g: (0, 0)),
                pl.BlockSpec((1, Cout), lambda g: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, T, Cout), jnp.bfloat16),
                jax.ShapeDtypeStruct((1, Cout), jnp.float32),
                jax.ShapeDtypeStruct((1, Cout), jnp.float32),
            ],
            interpret=interpret,
        )

    def pallas_call_flat(with_stats, S):
        return pl.pallas_call(
            functools.partial(_kernel_flat, with_stats, S),
            grid=(B // S,),
            in_specs=[
                pl.BlockSpec((S * T, Cin), lambda g: (g, 0)),
                pl.BlockSpec((3, Cin, Cout), lambda g: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((S * T, Cout), lambda g: (g, 0)),
                pl.BlockSpec((1, Cout), lambda g: (0, 0)),
                pl.BlockSpec((1, Cout), lambda g: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * T, Cout), jnp.bfloat16),
                jax.ShapeDtypeStruct((1, Cout), jnp.float32),
                jax.ShapeDtypeStruct((1, Cout), jnp.float32),
            ],
            interpret=interpret,
        )

    @jax.jit
    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    @jax.jit
    def xla_conv_stats(x, w):
        y = xla_conv(x, w)
        yf = y.astype(jnp.float32)
        return y, jnp.sum(yf, axis=(0, 1)), jnp.sum(yf * yf, axis=(0, 1))

    @jax.jit
    def pallas_conv(x, w):
        y, _, _ = pallas_call(False)(x, w)
        return y

    @jax.jit
    def pallas_fused(x, w):
        y, s1, s2 = pallas_call(True)(x, w)
        return y, s1[0], s2[0]

    def make_flat(with_stats, S):
        @jax.jit
        def fn(x, w):
            y, s1, s2 = pallas_call_flat(with_stats, S)(
                x.reshape(B * T, Cin), w)
            return y.reshape(B, T, Cout), s1[0], s2[0]
        return fn

    arms = {"xla_conv": xla_conv, "xla_conv_stats": xla_conv_stats,
            "pallas_conv": pallas_conv, "pallas_fused": pallas_fused}
    for S in (2, 4):
        # Mosaic requires block rows divisible by 8 (or the full array).
        if B % S == 0 and (S * T) % 8 == 0 and (B * T) % (S * T) == 0:
            arms[f"pallas_fused_flat{S}"] = make_flat(True, S)
    return arms


def check(B=4, T=96, Cin=128, Cout=128, interpret=True):
    """Correctness: pallas arms equal the XLA conv (bf16 tolerance)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, Cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, Cin, Cout)) * 0.05, jnp.bfloat16)
    arms = make_arms(B, T, Cin, Cout, interpret=interpret)
    y_ref, s1_ref, s2_ref = arms["xla_conv_stats"](x, w)
    y_p, s1_p, s2_p = arms["pallas_fused"](x, w)
    y_c = arms["pallas_conv"](x, w)
    np.testing.assert_allclose(np.float32(y_p), np.float32(y_ref),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.float32(y_c), np.float32(y_p),
                               rtol=0, atol=0)
    # stats accumulate from the f32 acc (vs the bf16-rounded y): loose rel
    np.testing.assert_allclose(s1_p, s1_ref, rtol=5e-2, atol=2.0)
    np.testing.assert_allclose(s2_p, s2_ref, rtol=5e-2, atol=2.0)
    for name, fn in arms.items():
        if "flat" in name:
            y_f, s1_f, s2_f = fn(x, w)
            np.testing.assert_allclose(np.float32(y_f), np.float32(y_p),
                                       rtol=0, atol=0)
            np.testing.assert_allclose(s1_f, s1_p, rtol=1e-5, atol=1e-2)
            np.testing.assert_allclose(s2_f, s2_p, rtol=1e-5, atol=1e-2)
    print("check OK")


def bench_shape(tag, B, T, Cin, Cout, windows, reps=100):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, Cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, Cin, Cout)) * 0.05, jnp.bfloat16)
    arms = make_arms(B, T, Cin, Cout)
    flops = 2 * B * T * Cin * Cout * 3
    out = {}
    order = ["xla_conv", "xla_conv_stats", "pallas_conv", "pallas_fused",
             *[n for n in arms if "flat" in n], "xla_conv_stats_ctrl"]
    for name in order:
        fn = arms[name.removesuffix("_ctrl")]
        jax.block_until_ready(fn(x, w))
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(x, w)
            jax.block_until_ready(r)
            times.append((time.perf_counter() - t0) / reps)
        med = statistics.median(times)
        # min = the noise-floor estimate (tunnel jitter only inflates)
        out[name] = {"us": round(med * 1e6, 1),
                     "min_us": round(min(times) * 1e6, 1),
                     "tflops_at_min": round(flops / min(times) / 1e12, 2),
                     "spread_pct": round(
                         100 * (max(times) - min(times)) / med, 1)}
        _log(f"{tag} {name}: {out[name]}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode correctness check only (CPU-safe)")
    args = ap.parse_args()
    if args.check:
        import jax
        jax.config.update("jax_platforms", "cpu")
        check()
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    check(interpret=False)  # on-chip correctness first
    out = {"device": jax.devices()[0].device_kind}
    out["res2a_64x312x512_512"] = bench_shape("res2a", 64, 312, 512, 512,
                                              args.windows)
    out["conv3_64x1250x128_256"] = bench_shape("conv3", 64, 1250, 128, 256,
                                               args.windows)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
