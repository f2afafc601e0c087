"""Model-breadth throughput rows (BENCH.md evidence).

Measures augmented-training throughput for the non-headline model families
on the real chip, same methodology as bench.py (median of N windows,
bf16 compute, device-resident corpus, Pallas mix kernels):

  * Potes 1-D CNN, batch 64, 4x2500, durmixmagwarp(0.2,4)  (the paper's
    second headline model, train_model.py:306-338)
  * ResNet9-2D, batch 64, 1x128x128 spec128, durratiomixup (the 2-D
    headline config, experiments_spectrograms.ipynb)

Each row reports per-step dispatch and scan_k=8 rates.

Usage: python scripts/bench_models.py [--windows N]
Prints one JSON object (not the driver's bench line — bench.py owns that).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

MEASURE_STEPS = 48
SCAN_K = 8


def _log(msg: str) -> None:
    print(f"[bench_models {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def bench_config(name, model_name, dataset, method, batch, windows,
                 compute_dtype="bf16"):
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
    from pcgmix_tpu.data import (
        EpochIterator, physionet_split, synthetic_physionet_dict,
        synthetic_spectrogram_dict,
    )
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.losses import init_selc_table
    from pcgmix_tpu.train.steps import (
        TrainState, make_multi_step, make_optimizer, make_train_step,
    )

    spectro = "spec" in dataset
    steps_needed = MEASURE_STEPS + SCAN_K + 5
    n_wavs = max(8, int(np.ceil(steps_needed * batch / 8 * 1.15)))
    if spectro:
        # keep the resident corpus small (the axon remote-compile tunnel
        # rejects oversized constant uploads); batches cycle over it
        size = 128
        n_wavs = 96
        d = synthetic_spectrogram_dict(
            num_wavs_train=n_wavs, num_wavs_test=2, segments_per_wav=8,
            size=size, seed=0,
        )
        ds = physionet_split(d, "train", train_balance=False, spectrogram=True)
        channels, sig_len, spec_freq = 1, size, size
        example = jnp.zeros((1, 1, size, size), jnp.float32)
    else:
        sig_len = 2500
        # cap the resident corpus under the tunnel's constant-upload limit
        # (~150 MB); batches cycle over it
        n_wavs = min(n_wavs, 400)
        d = synthetic_physionet_dict(
            num_wavs_train=n_wavs, num_wavs_test=2, segments_per_wav=8,
            sig_len=sig_len, seed=0,
        )
        ds = physionet_split(d, "train", train_balance=False)
        channels, spec_freq = 4, 0
        example = jnp.zeros((1, channels, sig_len), jnp.float32)

    dtype = jnp.bfloat16 if compute_dtype == "bf16" else None
    model = build_model(model_name, dataset=dataset, train=True,
                        compute_dtype=dtype)
    tx = make_optimizer("adam", 0.01, 1e-4, 0.1, 10_000, use_sched=True)
    variables = model.init(jax.random.PRNGKey(4), example)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        soft_labels=init_selc_table(ds.label, 2),
        step=jnp.asarray(0, jnp.int32),
    )
    engine = AugmentEngine(AugmentConfig(
        method=method, batch_size=batch, num_channels=channels,
        sig_len=sig_len, spec_freq=spec_freq, spectrogram=spectro,
        model=model_name, use_pallas=True,
    ))
    step = make_train_step(
        model, tx, selc_es=999, engine=engine,
        train_data=jnp.asarray(ds.data), train_labels=jnp.asarray(ds.label),
    )
    multi = make_multi_step(step)
    key = jax.random.PRNGKey(0)

    def batches(start, n):
        """n batches, cycling over the corpus with fresh epoch shuffles."""
        count = 0
        epoch = 0
        while count < n:
            it = EpochIterator(ds, batch, seed=1, step_count=start + epoch,
                               parity="numpy", materialize_data=False)
            for b in it:
                yield b
                count += 1
                if count >= n:
                    return
            epoch += 1

    def run_steps(n, start, scan_k):
        """Returns the number of steps actually DISPATCHED — with scan_k>1 a
        trailing partial chunk is planned but never executed, and must not be
        counted in the throughput rate."""
        nonlocal state
        count = 0
        executed = 0
        buf_i, buf_p, buf_s = [], [], []
        for b in batches(start, n):
            sc = start + count
            if scan_k > 1:
                arr, _ = engine.plan_arrays_or_identity(
                    sc, b["frames"], b["label"], b["wav"]
                )
                buf_i.append(b["indices"])
                buf_p.append(arr)
                buf_s.append(sc)
                if len(buf_i) == scan_k:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *buf_p,
                    )
                    state, _ = multi(state, jnp.asarray(np.stack(buf_i)),
                                     stacked, jnp.asarray(buf_s), 1, key)
                    buf_i, buf_p, buf_s = [], [], []
                    executed += scan_k
            else:
                plan = engine.plan(sc, b["frames"], b["label"], b["wav"])
                state, _ = step(state, {"indices": jnp.asarray(b["indices"])},
                                plan.arrays, 1, jax.random.fold_in(key, sc))
                executed += 1
            count += 1
            if count >= n:
                break
        jax.block_until_ready(state.params)
        return executed

    row = {}
    for scan_k in (1, SCAN_K):
        _log(f"{name}: compiling scan_k={scan_k}")
        run_steps(max(3, scan_k), 0, scan_k)
        rates = []
        for rep in range(windows):
            t0 = time.perf_counter()
            n = run_steps(MEASURE_STEPS, 3 + rep, scan_k)
            dt = time.perf_counter() - t0
            rates.append(n * batch / dt)
            _log(f"{name} scan_k={scan_k} window {rep + 1}/{windows}: "
                 f"{rates[-1]:.0f} samples/s")
        med = statistics.median(rates)
        spread = (max(rates) - min(rates)) / med if med else 0.0
        tag = "perstep" if scan_k == 1 else f"scan{scan_k}"
        row[f"{tag}_sps"] = round(med, 1)
        row[f"{tag}_spread_pct"] = round(100 * spread, 1)
    return row


def bench_inference(batch, windows):
    """Serving-path forward throughput: jitted softmax forward on the
    flagship 1-D ResNet9 (pcgmix_tpu/serve.py Classifier._forward)."""
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.models import build_model

    model = build_model("resnet9", train=False, compute_dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 4, 2500), jnp.float32)
    variables = model.init(jax.random.PRNGKey(4), x[:1])

    @jax.jit
    def forward(data):
        out = model.apply(variables, data)
        return jax.nn.softmax(out, axis=1)

    jax.block_until_ready(forward(x))
    _log(f"inference b{batch}: compiled")
    rates = []
    reps = 20
    for rep in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = forward(x)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        rates.append(reps * batch / dt)
        _log(f"inference b{batch} window {rep + 1}/{windows}: "
             f"{rates[-1]:.0f} samples/s")
    med = statistics.median(rates)
    spread = (max(rates) - min(rates)) / med if med else 0.0
    return {"sps": round(med, 1), "spread_pct": round(100 * spread, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--batch-sweep", action="store_true",
                    help="instead of the model rows, sweep ResNet9 1-D "
                         "batch sizes (128, 256) for the scaling curve")
    ap.add_argument("--zoo", action="store_true",
                    help="instead of the model rows, measure the tsai-zoo "
                         "conv families (InceptionTime, XceptionTime, "
                         "XResNet1d18) at the headline 1-D config")
    ap.add_argument("--compute-dtype", choices=("bf16", "fp32"),
                    default="bf16",
                    help="model compute dtype for the training rows "
                         "(BENCH.md zoo table has both columns)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    out = {"device": jax.devices()[0].device_kind, "batch": 64,
           "measure_steps": MEASURE_STEPS, "windows": args.windows,
           "compute_dtype": args.compute_dtype}
    dt = args.compute_dtype
    if args.batch_sweep:
        for b in (128, 256):
            out[f"resnet9_1d_durmixmagwarp_b{b}"] = bench_config(
                f"ResNet9-b{b}", "resnet9", "PhysioNet",
                "durmixmagwarp(0.2,4)", b, args.windows, compute_dtype=dt,
            )
        print(json.dumps(out, indent=2))
        return
    if args.zoo:
        # the conv-family zoo models at the headline workload; the
        # quadratic-by-design (XCM at window=T) and sequential (RNN family)
        # zoo members are excluded — their cost profile is the
        # architecture's, not the framework's
        for name in ("InceptionTime", "XceptionTime", "XResNet1d18"):
            out[f"{name.lower()}_1d_durmixmagwarp"] = bench_config(
                name, name, "PhysioNet", "durmixmagwarp(0.2,4)", 64,
                args.windows, compute_dtype=dt,
            )
        print(json.dumps(out, indent=2))
        return
    out["potes_1d_durmixmagwarp"] = bench_config(
        "Potes", "Potes", "PhysioNet", "durmixmagwarp(0.2,4)", 64,
        args.windows, compute_dtype=dt,
    )
    out["resnet9_2d_spec128_durratiomixup"] = bench_config(
        "ResNet9-2D", "resnet9", "PhysioNet(spec128)", "durratiomixup", 64,
        args.windows, compute_dtype=dt,
    )
    out["resnet9_1d_inference_b256"] = bench_inference(256, args.windows)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
