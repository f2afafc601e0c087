"""One-off perf study on the real chip: fp32 vs bf16, per-step dispatch vs
K-step scan, pallas on/off.  Informs bench.py methodology (VERDICT r1 weak
items 1-2)."""

from __future__ import annotations

import json
import time

import numpy as np


def run(compute_dtype: str, scan_k: int, use_pallas: bool, steps=60, reps=5):
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
    from pcgmix_tpu.data import EpochIterator, physionet_split, synthetic_physionet_dict
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.losses import init_selc_table
    from pcgmix_tpu.train.steps import (
        TrainState, make_multi_step, make_optimizer, make_train_step,
    )

    BATCH, SIG_LEN, CHANNELS = 64, 2500, 4
    # each measurement window restarts an EpochIterator, so the corpus only
    # needs steps+8 batches, not steps*reps
    n_wavs = max(8, int(np.ceil((steps + 8) * BATCH / 8 * 1.15)))
    dataset = synthetic_physionet_dict(
        num_wavs_train=n_wavs, num_wavs_test=2, segments_per_wav=8,
        sig_len=SIG_LEN, seed=0,
    )
    train_ds = physionet_split(dataset, "train", train_balance=False)

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    model = build_model("resnet9", train=True, compute_dtype=dtype)
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
            use_pallas=use_pallas,
        )
    )
    step = make_train_step(
        model, tx, selc_es=999, engine=engine,
        train_data=jnp.asarray(train_ds.data),
        train_labels=jnp.asarray(train_ds.label),
    )
    multi = make_multi_step(step) if scan_k > 1 else None
    key = jax.random.PRNGKey(0)

    def run_steps(n, start):
        nonlocal state
        it = EpochIterator(train_ds, BATCH, seed=1, step_count=start,
                           parity="numpy", materialize_data=False)
        count = 0
        executed = 0  # only DISPATCHED steps count toward the rate: a
                      # trailing partial scan buffer is planned, not run
        if scan_k > 1:
            buf_i, buf_p, buf_s = [], [], []
            for batch in it:
                sc = start + count
                arr, _ = engine.plan_arrays_or_identity(
                    sc, batch["frames"], batch["label"], batch["wav"]
                )
                buf_i.append(batch["indices"]); buf_p.append(arr); buf_s.append(sc)
                count += 1
                if len(buf_i) == scan_k:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack([np.asarray(x) for x in xs]), *buf_p
                    )
                    state, _ = multi(
                        state, jnp.asarray(np.stack(buf_i)), stacked,
                        jnp.asarray(buf_s), 1, key,
                    )
                    buf_i, buf_p, buf_s = [], [], []
                    executed += scan_k
                if count >= n:
                    break
        else:
            for batch in it:
                sc = start + count
                plan = engine.plan(sc, batch["frames"], batch["label"], batch["wav"])
                state, _ = step(
                    state, {"indices": jnp.asarray(batch["indices"])},
                    plan.arrays, 1, jax.random.fold_in(key, sc),
                )
                count += 1
                executed += 1
                if count >= n:
                    break
        jax.block_until_ready(state.params)
        return executed

    run_steps(max(4, scan_k), 0)  # compile
    rates = []
    for rep in range(reps):
        t0 = time.time()
        n = run_steps(steps, 8 + rep * steps)
        dt = time.time() - t0
        rates.append(n * 64 / dt)
    rates = np.array(rates)
    # FLOPs from the compiled executable
    flops = None
    try:
        lowered = step.lower(
            state, {"indices": jnp.zeros(BATCH, jnp.int32)},
            engine.plan(0, train_ds.frames[:BATCH], train_ds.label[:BATCH],
                        train_ds.wav[:BATCH]).arrays,
            1, key,
        )
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        flops = f"err: {e}"
    return {
        "cfg": dict(dtype=compute_dtype, scan_k=scan_k, pallas=use_pallas),
        "median": float(np.median(rates)),
        "min": float(rates.min()),
        "max": float(rates.max()),
        "flops_per_step": flops,
    }


if __name__ == "__main__":
    import sys

    cases = [
        ("bfloat16", 1, True),
        ("bfloat16", 8, True),
        ("float32", 1, True),
        ("bfloat16", 1, False),
    ]
    if len(sys.argv) > 1:
        cases = cases[: int(sys.argv[1])]
    for dtype, k, pallas in cases:
        r = run(dtype, k, pallas)
        print(json.dumps(r), flush=True)
