"""Step-time breakdown on the real chip (BENCH.md evidence).

Times the headline-config train step's components separately (median over
reps, device-synced):
  - host plan build (CPU, reference-exact RNG)
  - augment apply only (gather + piecewise mix + magwarp)
  - forward+backward+update only (pre-augmented input)
  - full fused step, per-step dispatch
  - full fused step at scan_k in {8, 16, 32}
and captures one jax.profiler trace of a measurement window.

Usage: python scripts/step_breakdown.py [trace_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
    from pcgmix_tpu.data import EpochIterator, physionet_split, synthetic_physionet_dict
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.losses import init_selc_table
    from pcgmix_tpu.train.steps import (
        TrainState, make_multi_step, make_optimizer, make_train_step,
    )

    BATCH, SIG_LEN, CHANNELS, STEPS, REPS = 64, 2500, 4, 48, 5
    dataset = synthetic_physionet_dict(
        num_wavs_train=int(np.ceil((STEPS + 40) * BATCH / 8 * 1.15)),
        num_wavs_test=2, segments_per_wav=8, sig_len=SIG_LEN, seed=0,
    )
    train_ds = physionet_split(dataset, "train", train_balance=False)

    model = build_model("resnet9", train=True, compute_dtype=jnp.bfloat16)
    tx = make_optimizer("adam", 0.01, 1e-4, 0.1, 10_000, use_sched=True)
    variables = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, CHANNELS, SIG_LEN), jnp.float32)
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        soft_labels=init_selc_table(train_ds.label, 2),
        step=jnp.asarray(0, jnp.int32),
    )
    engine = AugmentEngine(
        AugmentConfig(
            method="durmixmagwarp(0.2,4)", batch_size=BATCH,
            num_channels=CHANNELS, sig_len=SIG_LEN, model="resnet9",
            use_pallas=True,
        )
    )
    data_dev = jnp.asarray(train_ds.data)
    labels_dev = jnp.asarray(train_ds.label)
    step = make_train_step(
        model, tx, selc_es=999, engine=engine,
        train_data=data_dev, train_labels=labels_dev,
    )
    key = jax.random.PRNGKey(0)
    out = {}

    def med(times):
        return round(1e3 * statistics.median(times), 3)  # ms

    # --- host plan build ---------------------------------------------------
    it = EpochIterator(train_ds, BATCH, seed=1, step_count=0, parity="numpy",
                       materialize_data=False)
    batches = []
    for b in it:
        batches.append(b)
        if len(batches) >= STEPS:
            break
    ts = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        for i, b in enumerate(batches):
            engine.plan(i, b["frames"], b["label"], b["wav"])
        ts.append((time.perf_counter() - t0) / len(batches))
    out["host_plan_ms"] = med(ts)

    plans = [engine.plan(i, b["frames"], b["label"], b["wav"])
             for i, b in enumerate(batches)]

    # --- augment apply only ------------------------------------------------
    @jax.jit
    def apply_only(arrays, idx):
        # production feeds fp32 (the model casts to bf16 internally)
        x = jnp.take(data_dev, idx, axis=0)
        ohe = jax.nn.one_hot(jnp.take(labels_dev, idx, axis=0), 2,
                             dtype=jnp.float32)
        return engine.apply(x, ohe, arrays)

    idxs = [jnp.asarray(b["indices"]) for b in batches]
    arrs = [p.arrays for p in plans]
    r = apply_only(arrs[0], idxs[0])
    jax.block_until_ready(r)
    ts = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        for a, i in zip(arrs, idxs):
            r = apply_only(a, i)
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) / len(arrs))
    out["augment_apply_ms"] = med(ts)

    # --- full step, per-step dispatch ---------------------------------------
    def full_window(start):
        nonlocal state
        for j, (a, i) in enumerate(zip(arrs, idxs)):
            state, o = step(state, {"indices": i}, a, 1,
                            jax.random.fold_in(key, start + j))
        jax.block_until_ready(state.params)

    full_window(0)
    ts = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        full_window(100 * (rep + 1))
        ts.append((time.perf_counter() - t0) / len(arrs))
    out["full_step_ms_perstep"] = med(ts)

    # --- trace capture of one window ----------------------------------------
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pcgmix_trace"
    try:
        jax.profiler.start_trace(trace_dir)
        full_window(1000)
        jax.profiler.stop_trace()
        out["trace_dir"] = trace_dir
    except Exception as e:
        out["trace_dir"] = f"unavailable: {e}"

    # --- scan_k sweep --------------------------------------------------------
    for k in (8, 16, 32):
        multi = make_multi_step(step)
        n_chunks = max(1, STEPS // k)

        def scan_window(start):
            nonlocal state
            for c in range(n_chunks):
                lo = c * k
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *arrs[lo:lo + k],
                )
                state, _ = multi(
                    state, jnp.asarray(np.stack([np.asarray(i) for i in
                                                 idxs[lo:lo + k]])),
                    stacked, jnp.asarray(list(range(start + lo,
                                                    start + lo + k))),
                    1, key,
                )
            jax.block_until_ready(state.params)

        scan_window(0)
        ts = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            scan_window(100 * (rep + 1))
            ts.append((time.perf_counter() - t0) / (n_chunks * k))
        out[f"full_step_ms_scan{k}"] = med(ts)
        out[f"samples_per_s_scan{k}"] = round(BATCH / (out[f"full_step_ms_scan{k}"] / 1e3))

    out["samples_per_s_perstep"] = round(BATCH / (out["full_step_ms_perstep"] / 1e3))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
