"""Does host plan-building hide behind device compute?

BENCH.md: at scan_k=8 the step wall (5.69 ms) is ~1 ms above pure device
time (4.71 ms), and host plan build is 0.41 ms/step.  A native (C++) plan
builder is only worth building if that 0.41 ms is on the critical path —
i.e. if the loop does NOT already overlap planning with the device's
async execution of the previous dispatch.

Measured here in ONE process (headline config — resnet9 bf16, scan_k=8,
durmixmagwarp, Pallas mix):

  live      — the production loop: plan 8 batches, dispatch, repeat;
  precomp   — all plans for the window are built and stacked BEFORE the
              timer starts; the timed loop only dispatches.

If live ≈ precomp, planning is already hidden by async dispatch and a
native plan builder buys nothing (record the negative result).  If
precomp is meaningfully faster, the delta bounds the native builder's
payoff.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(steps=48, reps=3):
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
    from pcgmix_tpu.data import (
        EpochIterator, physionet_split, synthetic_physionet_dict,
    )
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.losses import init_selc_table
    from pcgmix_tpu.train.steps import (
        TrainState, make_multi_step, make_optimizer, make_train_step,
    )

    BATCH, SIG_LEN, CHANNELS, SCAN_K = 64, 2500, 4, 8
    # Cap the resident corpus under the axon jit-captured-constant limit
    # (~150 MB / HTTP 413); 400 wavs x 8 segs = 50 batches/epoch >= 48 steps.
    n_wavs = min(400, max(8, int(np.ceil((steps + 8) * BATCH / 8 * 1.15))))
    dataset = synthetic_physionet_dict(
        num_wavs_train=n_wavs, num_wavs_test=2, segments_per_wav=8,
        sig_len=SIG_LEN, seed=0,
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
    engine = AugmentEngine(AugmentConfig(
        method="durmixmagwarp(0.2,4)", batch_size=BATCH,
        num_channels=CHANNELS, sig_len=SIG_LEN, model="resnet9",
        use_pallas=True,
    ))
    step = make_train_step(
        model, tx, selc_es=999, engine=engine,
        train_data=jnp.asarray(train_ds.data),
        train_labels=jnp.asarray(train_ds.label),
    )
    multi = make_multi_step(step)
    key = jax.random.PRNGKey(0)

    def window_batches(start, n):
        it = EpochIterator(train_ds, BATCH, seed=1, step_count=start,
                           parity="numpy", materialize_data=False)
        out = []
        for b in it:
            out.append(b)
            if len(out) >= n:
                break
        return out

    def build_flush(chunk, flush_start):
        """(indices (K,B), stacked plan arrays, steps (K,)) for one flush.

        Shared by both arms: the A/B measures only WHEN this work happens
        (inside vs before the timed loop), so both must run the same code.
        """
        arrs, idxs, scs = [], [], []
        for j, b in enumerate(chunk):
            sc = flush_start + j
            a, _ = engine.plan_arrays_or_identity(
                sc, b["frames"], b["label"], b["wav"]
            )
            arrs.append(a); idxs.append(b["indices"]); scs.append(sc)
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *arrs
        )
        return jnp.asarray(np.stack(idxs)), stacked, jnp.asarray(scs)

    def flushes_of(bs, start):
        return [
            build_flush(bs[f * SCAN_K:(f + 1) * SCAN_K], start + f * SCAN_K)
            for f in range(len(bs) // SCAN_K)
        ]

    def run_live(n, start):
        nonlocal state
        bs = window_batches(start, n)
        executed = 0
        for f in range(len(bs) // SCAN_K):
            idxs, stacked, scs = build_flush(
                bs[f * SCAN_K:(f + 1) * SCAN_K], start + f * SCAN_K
            )
            state, _ = multi(state, idxs, stacked, scs, 1, key)
            executed += SCAN_K
        jax.block_until_ready(state.params)
        return executed

    def run_precomp(flushes):
        nonlocal state
        executed = 0
        for idxs, stacked, scs in flushes:
            state, _ = multi(state, idxs, stacked, scs, 1, key)
            executed += SCAN_K
        jax.block_until_ready(state.params)
        return executed

    run_live(SCAN_K, 0)  # compile
    out = []
    for kind in ("live", "precomp", "live"):  # trailing control for drift
        rates = []
        for rep in range(reps):
            start = 8 + rep * steps
            if kind == "precomp":
                fl = flushes_of(window_batches(start, steps), start)
                t0 = time.perf_counter()
                n = run_precomp(fl)
            else:
                t0 = time.perf_counter()
                n = run_live(steps, start)
            rates.append(n * BATCH / (time.perf_counter() - t0))
        out.append({"kind": kind, "median": float(np.median(rates)),
                    "min": float(min(rates)), "max": float(max(rates))})
        print(json.dumps(out[-1]), flush=True)
    base = out[0]["median"]
    print(json.dumps({"summary": {r["kind"] + str(i): round(r["median"] / base, 3)
                                  for i, r in enumerate(out)}}))


if __name__ == "__main__":
    main()
