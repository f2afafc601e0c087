"""Benchmark: PCGmix+ (durmixmagwarp) augmented training throughput.

Measures the full training-step pipeline — host plan (reference-exact RNG) +
jitted augment/forward/backward/update — for the headline configuration
(1-D ResNet9, batch 64, 4x2500 inputs, durmixmagwarp(0.2,4); BASELINE.md) on
the available accelerator, and compares against a faithful CPU emulation of
the reference's per-sample hot loop (torch model + python slice loop +
per-sample scipy CubicSpline magnitude warp, augmentations.py:970-977,
:924-928).

Methodology (round-2 overhaul):
  * four modes are measured: the headline `value` is bf16 + SCAN_K-step
    scan dispatch (TrainConfig(compute_dtype="bfloat16",
    steps_per_dispatch=8) — the production fast config; amortizing dispatch
    latency is worth ~2-6x on the tunneled chip, see BENCH.md), an fp32 +
    scan row (reference-numerical-parity mode in the same compute-bound
    dispatch regime, so it gets a stable number), plus per-step bf16 and
    per-step fp32 rows (tunnel-latency-bound; indicative only);
  * each mode reports the MEDIAN of its measurement windows of
    MEASURE_STEPS steps each, plus the (max-min)/median spread;
  * MFU is estimated from XLA's compiled cost analysis (flops per step /
    wall-time per step / chip peak);
  * the CPU reference baseline runs >=30 full steps (cached in
    .bench_cpu_baseline.json keyed on the step count; delete the file to
    re-measure).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N,
   ...methodology fields...}
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np

BATCH = 64
SIG_LEN = 2500
CHANNELS = 4
MEASURE_STEPS = 48
WINDOWS = 5
SCAN_K = 8  # headline mode fuses K steps per dispatch (lax.scan), amortizing
            # the per-dispatch host→device latency (see BENCH.md)
CPU_STEPS = 30
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")
CACHE_KEY = f"resnet9-b{BATCH}-t{SIG_LEN}-c{CHANNELS}-durmixmagwarp-s{CPU_STEPS}"

# chip peak dense-matmul throughput (bf16), FLOP/s — for the MFU estimate
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,       # v5p
    "TPU v6 lite": 918e12,  # v6e (Trillium)
}


def _make_batches(num_steps: int):
    from pcgmix_tpu.data import physionet_split, synthetic_physionet_dict

    # enough cycles for num_steps full batches after the ~5% sig_qual drop
    n_wavs = max(8, int(np.ceil(num_steps * BATCH / 8 * 1.15)))
    dataset = synthetic_physionet_dict(
        num_wavs_train=n_wavs, num_wavs_test=2, segments_per_wav=8,
        sig_len=SIG_LEN, seed=0,
    )
    ds = physionet_split(dataset, "train", train_balance=False)
    assert len(ds) >= num_steps * BATCH, len(ds)
    return ds


def _enable_compile_cache():
    """Persistent XLA compile cache: the scan-of-step program takes ~10 min
    to compile cold on the tunneled chip; warm runs skip it entirely."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def _build(train_ds, compute_dtype):
    """Build (engine, step_fn, initial state, key) for one compute mode."""
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.losses import init_selc_table
    from pcgmix_tpu.train.steps import TrainState, make_optimizer, make_train_step

    model = build_model("resnet9", train=True, compute_dtype=compute_dtype)
    tx = make_optimizer("adam", 0.01, 1e-4, 0.1, MEASURE_STEPS + 5, use_sched=True)
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
    # device-resident corpus: the per-step host→device traffic is the
    # few-KB augmentation plan; batch rows are gathered in HBM
    step = make_train_step(
        model, tx, selc_es=999, engine=engine,
        train_data=jnp.asarray(train_ds.data),
        train_labels=jnp.asarray(train_ds.label),
    )
    return engine, step, state, jax.random.PRNGKey(0)


def _flops_per_step(engine, step, state, key) -> float | None:
    """FLOPs of one compiled train step, from XLA cost analysis."""
    import jax.numpy as jnp

    _log("XLA cost analysis (second compile)")
    try:
        labels = np.zeros(BATCH, np.int64)
        frames = np.tile(
            np.linspace(0, SIG_LEN - 1, 5).astype(np.int64), (BATCH, 1)
        )
        wavs = np.zeros(BATCH, np.int64)
        plan = engine.plan(0, frames, labels, wavs)
        dev_batch = {"indices": jnp.zeros(BATCH, jnp.int32)}
        compiled = step.lower(state, dev_batch, plan.arrays, 1, key).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:
        return None


def _log(msg: str) -> None:
    import sys

    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def bench_mode(train_ds, compute_dtype, windows: int = WINDOWS,
               want_flops: bool = True, scan_k: int = 1):
    """Median samples/s over `windows` measurement windows + spread."""
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.data import EpochIterator

    _log(f"building {compute_dtype.__name__} step (scan_k={scan_k})")
    engine, step, state, key = _build(train_ds, compute_dtype)
    multi = None
    if scan_k > 1:
        from pcgmix_tpu.train.steps import make_multi_step

        multi = make_multi_step(step)

    def run_steps(n, start):
        """Returns the number of steps actually DISPATCHED: with scan_k>1 a
        trailing partial chunk is planned but never executed and must not be
        credited in the rate (today MEASURE_STEPS % SCAN_K == 0, so this is
        a guard, not a behavior change)."""
        nonlocal state
        it = EpochIterator(
            train_ds, BATCH, seed=1, step_count=start, parity="numpy",
            materialize_data=False,
        )
        count = 0
        executed = 0
        if scan_k > 1:
            buf_i, buf_p, buf_s = [], [], []
            for batch in it:
                sc = start + count
                arr, _ = engine.plan_arrays_or_identity(
                    sc, batch["frames"], batch["label"], batch["wav"]
                )
                buf_i.append(batch["indices"])
                buf_p.append(arr)
                buf_s.append(sc)
                count += 1
                if len(buf_i) == scan_k:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *buf_p,
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
                plan = engine.plan(
                    sc, batch["frames"], batch["label"], batch["wav"]
                )
                dev_batch = {"indices": jnp.asarray(batch["indices"])}
                state, out = step(
                    state, dev_batch, plan.arrays, 1,
                    jax.random.fold_in(key, sc),
                )
                count += 1
                executed += 1
                if count >= n:
                    break
        jax.block_until_ready(state.params)
        return executed

    run_steps(max(3, scan_k), 0)  # warmup / compile
    _log("compiled; measuring")
    rates = []
    for rep in range(windows):
        t0 = time.perf_counter()
        n = run_steps(MEASURE_STEPS, 3 + rep)
        dt = time.perf_counter() - t0
        rates.append(n * BATCH / dt)
        _log(f"window {rep + 1}/{windows}: {n * BATCH / dt:.0f} samples/s")
    med = statistics.median(rates)
    spread = (max(rates) - min(rates)) / med if med else 0.0
    flops = _flops_per_step(engine, step, state, key) if want_flops else None
    return med, spread, flops


def bench_cpu_reference() -> float:
    """Faithful reference-style CPU hot loop: per-sample python slice mixing,
    per-sample-per-channel scipy CubicSpline magnitude warp, torch fwd/bwd."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        if cached.get("key") == CACHE_KEY:
            return cached["samples_per_sec"]

    import torch
    import torch.nn as nn
    from scipy.interpolate import CubicSpline

    torch.set_num_threads(os.cpu_count() or 1)

    def conv_block(ci, co, pool=False):
        layers = [nn.Conv1d(ci, co, 3, padding=1), nn.BatchNorm1d(co), nn.ReLU()]
        if pool:
            layers.append(nn.MaxPool1d(2))
        return nn.Sequential(*layers)

    class ResNet9Torch(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = conv_block(CHANNELS, 64)
            self.c2 = conv_block(64, 128, True)
            self.r1 = nn.Sequential(conv_block(128, 128), conv_block(128, 128))
            self.c3 = conv_block(128, 256, True)
            self.c4 = conv_block(256, 512, True)
            self.r2 = nn.Sequential(conv_block(512, 512), conv_block(512, 512))
            self.pool = nn.MaxPool1d(4)
            self.fc = nn.Linear(39936, 2)

        def forward(self, x):
            x = self.c2(self.c1(x))
            x = self.r1(x) + x
            x = self.c4(self.c3(x))
            x = self.r2(x) + x
            return self.fc(torch.flatten(self.pool(x), 1))

    train_ds = _make_batches(2)
    model = ResNet9Torch()
    opt = torch.optim.Adam(model.parameters(), lr=0.01, weight_decay=1e-4)

    def aug_reference_style(data: torch.Tensor, frames: np.ndarray) -> torch.Tensor:
        b = data.shape[0]
        mix = np.random.permutation(b)
        lam = float(np.random.beta(1, 1))
        out = torch.zeros_like(data)
        # per-sample per-segment slice blending (augmentations.py:289-304 style)
        for i in range(b):
            d = data[i].clone()
            f1, f2 = frames[i], frames[mix[i]]
            for k in range(4):
                L = min(f1[k + 1] - f1[k], f2[k + 1] - f2[k])
                d[:, f1[k] : f1[k] + L] = (
                    d[:, f1[k] : f1[k] + L] * lam
                    + data[mix[i]][:, f2[k] : f2[k] + L] * (1 - lam)
                )
            out[i] = d
        # per-sample per-channel CubicSpline magnitude warp
        # (augmentations.py:674-683, :924-928 style)
        x = out.numpy().transpose(0, 2, 1)
        steps = np.linspace(0, x.shape[1] - 1.0, 6)
        warps = np.random.normal(1.0, 0.2, (b, 6, x.shape[2]))
        orig = np.arange(x.shape[1])
        ret = np.zeros_like(x)
        for i in range(b):
            warper = np.array(
                [CubicSpline(steps, warps[i, :, c])(orig) for c in range(x.shape[2])]
            ).T
            ret[i] = x[i] * warper
        return torch.from_numpy(ret.transpose(0, 2, 1).copy())

    idx = np.arange(BATCH)
    data = torch.from_numpy(train_ds.data[idx].astype(np.float32))
    frames = train_ds.frames[idx]
    target = torch.from_numpy(train_ds.label[idx])

    # one untimed warmup step (torch lazily initializes conv kernels/threads)
    auged = aug_reference_style(data, frames)
    loss = nn.functional.cross_entropy(model(auged), target)
    loss.backward()
    opt.step()
    opt.zero_grad()

    t0 = time.perf_counter()
    for _ in range(CPU_STEPS):
        auged = aug_reference_style(data, frames)
        out = model(auged)
        loss = nn.functional.cross_entropy(out, target)
        loss.backward()
        nn.utils.clip_grad_value_(model.parameters(), 0.1)
        opt.step()
        opt.zero_grad()
    dt = time.perf_counter() - t0
    sps = CPU_STEPS * BATCH / dt
    with open(CACHE, "w") as f:
        json.dump({"key": CACHE_KEY, "samples_per_sec": sps, "seconds": dt,
                   "steps": CPU_STEPS}, f)
    return sps


def bench_gang_rows() -> dict:
    """Measured gang-training rows for the driver JSON (VERDICT r3 #1).

    Reuses scripts/bench_gang.py's arm machinery in-process (interleaved
    control discipline: never compare rates across processes).  Potes is
    the gang-thesis model — 130k params leaves the MXU idle at batch 64,
    so vmapping S grid members into one program multiplies useful work per
    dispatch; S=8 is the chip-measured sweet spot
    (artifacts/bench_gang_potes_pallas_sweep_r4.json).
    """
    import statistics as st
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import bench_gang

    bench_gang.MODEL = "Potes"
    _log("gang rows: Potes sequential (pallas) arm")
    seq = bench_gang.build(use_pallas=True, gang_s=None)
    seq_rates = bench_gang.measure(seq, reps=3)
    _log(f"gang rows: seq median {st.median(seq_rates):.0f} samples/s")
    gang = bench_gang.build(use_pallas=True, gang_s=8)
    gang_rates = bench_gang.measure(gang, reps=3)
    _log(f"gang rows: gang-8 median {st.median(gang_rates):.0f} samples/s")
    del gang  # drop the stacked gang state before the control arm
    # (bench_gang.main discipline: measure the control under the same HBM
    # pressure as the seq arm, and don't OOM tighter chips)
    # interleaved control: has the tunnel drifted under the gang arm?
    seq_ctl = bench_gang.measure(seq, reps=2)
    seq_sps = st.median(seq_rates + seq_ctl)
    gang_sps = st.median(gang_rates)
    return {
        "gang_potes_s8_sps": round(gang_sps),
        "gang_potes_seq_sps": round(seq_sps),
        "gang_speedup_vs_seq": round(gang_sps / seq_sps, 2),
        "gang_note": "8-member Potes seed-grid gang (vmapped train step, "
                     "Pallas mix, bf16 + 8-step scan) vs the same-process "
                     "sequential Potes config; aggregated samples/s/chip",
    }


def _backend_available(timeout_s: int = 240) -> bool:
    """Bounded accelerator probe in a subprocess: jax.devices() blocks
    indefinitely when the tunneled backend is unreachable, which would hang
    the whole bench run — fail fast with a clean JSON line instead."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _backend_available():
        print(json.dumps({
            "metric": "PCGmix+ (durmixmagwarp) ResNet9 train throughput",
            "value": 0,
            "unit": "samples/sec/chip",
            "vs_baseline": 0,
            "error": "accelerator backend unavailable (device init timed "
                     "out after 240s) — not a regression; see the last "
                     "recorded BENCH_r*.json for the measured throughput",
        }))
        return

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    _log("generating synthetic corpus")
    train_ds = _make_batches(MEASURE_STEPS + SCAN_K + 5)
    # headline: bf16 + K-step scan dispatch (the production fast config)
    scan_sps, scan_spread, flops = bench_mode(
        train_ds, jnp.bfloat16, scan_k=SCAN_K
    )
    # secondary rows are host/tunnel-latency-bound in per-step mode, so
    # they swing 2-4x between processes (VERDICT r2 weak #4): use the full
    # window count AND label them indicative-only in the output
    bf16_sps, bf16_spread, _ = bench_mode(
        train_ds, jnp.bfloat16, want_flops=False
    )
    fp32_sps, fp32_spread, _ = bench_mode(
        train_ds, jnp.float32, want_flops=False
    )
    # fp32 + K-step scan: the reference-numerical-parity mode measured in
    # the SAME dispatch regime as the headline, so parity-mode throughput
    # is a stable number rather than tunnel noise (VERDICT r4 weak #4 —
    # the per-step fp32 row above showed 42.9% spread; the scan row is
    # compute-bound like the headline)
    fp32_scan_sps, fp32_scan_spread, _ = bench_mode(
        train_ds, jnp.float32, scan_k=SCAN_K, want_flops=False
    )
    try:
        gang_rows = bench_gang_rows()
    except Exception as e:  # noqa: BLE001 - gang rows must not sink the headline
        gang_rows = {"gang_error": f"{type(e).__name__}: {e}"[:300]}
    _log("CPU reference baseline")
    cpu_sps = bench_cpu_reference()

    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    mfu = None
    if flops and peak:
        mfu = (flops * scan_sps / BATCH) / peak

    out = {
        "metric": "PCGmix+ (durmixmagwarp) ResNet9 train throughput",
        "value": round(scan_sps, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(scan_sps / cpu_sps, 1),
        "scan_k": SCAN_K,
        "scan_spread_pct": round(100 * scan_spread, 1),
        "bf16_perstep_sps": round(bf16_sps, 1),
        "bf16_perstep_spread_pct": round(100 * bf16_spread, 1),
        "fp32_perstep_sps": round(fp32_sps, 1),
        "fp32_perstep_spread_pct": round(100 * fp32_spread, 1),
        "fp32_vs_baseline": round(fp32_sps / cpu_sps, 1),
        "fp32_scan_sps": round(fp32_scan_sps, 1),
        "fp32_scan_spread_pct": round(100 * fp32_scan_spread, 1),
        "fp32_scan_vs_baseline": round(fp32_scan_sps / cpu_sps, 1),
        "cpu_baseline_sps": round(cpu_sps, 2),
        "cpu_baseline_steps": CPU_STEPS,
        "windows": f"median of {WINDOWS}x{MEASURE_STEPS}-step windows",
        "perstep_rows_note": "per-step rows are tunnel-dispatch-bound and "
                             "vary 2-4x across processes; indicative only "
                             "(the scan headline is the production config)",
        "device": kind,
        **gang_rows,
    }
    if flops:
        out["flops_per_step"] = round(flops)
    if mfu is not None:
        out["mfu_pct"] = round(100 * mfu, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
