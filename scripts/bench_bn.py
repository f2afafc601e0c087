"""One-off perf study on the real chip: BatchNorm statistics variants.

BENCH.md's trace attributes ~27% of device time to `convert_reduce_fusion`
(batch-norm statistics: bf16 activations converted to fp32 inside the
mean/var reduces, fwd + bwd).  This experiment measures, in ONE process
(same tunnel conditions) on the headline config (resnet9, batch 64, bf16,
scan_k=8, durmixmagwarp), the upper bound of what attacking that line item
could buy:

  flax      — the production BN (flax promotes stats to fp32 always);
  bf16stats — stats computed entirely in bf16 (no converts; would need a
              training-quality revalidation before ever shipping);
  ghost16   — fp32 stats over the first 16 batch rows only (4x less
              reduce traffic; ghost-BN changes numerics, opt-in at best).

The variants swap the BN class via monkeypatch on the resnet9 module; the
rest of the step (augment plan, optimizer, SELC) is byte-identical.
"""

from __future__ import annotations

import json
import time
from typing import Any

import numpy as np


def _variant_bn(kind: str):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class ExperimentBN(nn.Module):
        use_running_average: bool
        dtype: Any = None

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
            )
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            if self.use_running_average:
                m = ra_mean.value.astype(x.dtype)
                v = ra_var.value.astype(x.dtype)
            else:
                xs = x[:16] if kind == "ghost16" else x
                sd = x.dtype if kind == "bf16stats" else jnp.float32
                xs = xs.astype(sd)
                axes = tuple(range(xs.ndim - 1))
                m32 = jnp.mean(xs, axes)
                v32 = jnp.mean(jnp.square(xs), axes) - jnp.square(m32)
                if not self.is_initializing() and self.is_mutable_collection(
                    "batch_stats"
                ):
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * m32.astype(
                        jnp.float32
                    )
                    ra_var.value = 0.9 * ra_var.value + 0.1 * v32.astype(
                        jnp.float32
                    )
                m = m32.astype(x.dtype)
                v = v32.astype(x.dtype)
            y = (x - m) * jax.lax.rsqrt(v + jnp.asarray(1e-5, x.dtype))
            return y * scale.astype(x.dtype) + bias.astype(x.dtype)

    return ExperimentBN


def run(kind: str, steps=48, reps=3):
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
    from pcgmix_tpu.data import (
        EpochIterator, physionet_split, synthetic_physionet_dict,
    )
    from pcgmix_tpu.models import resnet9 as resnet9_mod
    from pcgmix_tpu.train.losses import init_selc_table
    from pcgmix_tpu.train.steps import (
        TrainState, make_multi_step, make_optimizer, make_train_step,
    )

    BATCH, SIG_LEN, CHANNELS, SCAN_K = 64, 2500, 4, 8

    orig_bn = resnet9_mod.BatchNorm
    if kind != "flax":
        resnet9_mod.BatchNorm = _variant_bn(kind)
    try:
        n_wavs = max(8, int(np.ceil((steps + 8) * BATCH / 8 * 1.15)))
        dataset = synthetic_physionet_dict(
            num_wavs_train=n_wavs, num_wavs_test=2, segments_per_wav=8,
            sig_len=SIG_LEN, seed=0,
        )
        train_ds = physionet_split(dataset, "train", train_balance=False)
        model = resnet9_mod.ResNet9_1D(train=True, dtype=jnp.bfloat16)
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
        step = make_train_step(
            model, tx, selc_es=999, engine=engine,
            train_data=jnp.asarray(train_ds.data),
            train_labels=jnp.asarray(train_ds.label),
        )
        multi = make_multi_step(step)
        key = jax.random.PRNGKey(0)

        def run_steps(n, start):
            nonlocal state
            it = EpochIterator(
                train_ds, BATCH, seed=1, step_count=start, parity="numpy",
                materialize_data=False,
            )
            buf_i, buf_p, buf_s = [], [], []
            executed = count = 0
            for batch in it:
                sc = start + count
                arr, _ = engine.plan_arrays_or_identity(
                    sc, batch["frames"], batch["label"], batch["wav"]
                )
                buf_i.append(batch["indices"]); buf_p.append(arr); buf_s.append(sc)
                count += 1
                if len(buf_i) == SCAN_K:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack([np.asarray(x) for x in xs]), *buf_p
                    )
                    state, _ = multi(
                        state, jnp.asarray(np.stack(buf_i)), stacked,
                        jnp.asarray(buf_s), 1, key,
                    )
                    buf_i, buf_p, buf_s = [], [], []
                    executed += SCAN_K
                if count >= n:
                    break
            jax.block_until_ready(state.params)
            return executed

        run_steps(SCAN_K, 0)  # compile
        rates = []
        for rep in range(reps):
            t0 = time.time()
            n = run_steps(steps, 8 + rep * steps)
            rates.append(n * BATCH / (time.time() - t0))
        rates = np.array(rates)
        return {
            "kind": kind,
            "median": float(np.median(rates)),
            "min": float(rates.min()),
            "max": float(rates.max()),
        }
    finally:
        resnet9_mod.BatchNorm = orig_bn


if __name__ == "__main__":
    out = []
    for kind in ("flax", "bf16stats", "ghost16", "flax"):
        r = run(kind)
        print(json.dumps(r), flush=True)
        out.append(r)
    meds = {r["kind"]: r["median"] for r in reversed(out)}  # first 'flax' wins
    print(
        json.dumps(
            {
                "summary": {
                    k: round(meds[k] / meds["flax"], 3)
                    for k in meds
                }
            }
        )
    )
