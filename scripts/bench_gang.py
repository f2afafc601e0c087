"""Gang-training A/B on the real chip: S seed-grid members trained
sequentially (shared compiled step — already better than the reference,
which recompiles nothing but runs runs back-to-back) vs one vmapped gang
program (pcgmix_tpu/train/gang.py).

Discipline (BENCH.md): ONE process, interleaved control re-runs, best-of
windows; the tunnel's effective rate swings 2-4x across processes.

Production fast config: bf16 + 8-step scan dispatch.  The gang path runs
the XLA mix (vmap of the Pallas kernels is not wired); the sequential arm
is measured both pallas-off (isolates the ganging effect) and pallas-on
(the shipping config).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH, SIG_LEN, CHANNELS = 64, 2500, 4
SCAN_K = 8
METHOD = "durmixmagwarp(0.2,4)"
STEPS = 48  # per member per window
MODEL = "resnet9"  # --model overrides: the gang thesis lives on the SMALL
                   # models (Potes/resnet9-5k) that leave the MXU idle at
                   # batch 64; the 6M-param resnet9 saturates the chip alone


_SHARED: dict = {}  # one corpus + one device copy across every arm (HBM!)


def build(use_pallas: bool, gang_s: int | None, conv_impl: str = "xla"):
    """Returns run_window(start) -> samples-processed for one arm."""
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
    from pcgmix_tpu.data import EpochIterator, physionet_split, synthetic_physionet_dict
    from pcgmix_tpu.models import build_model
    from pcgmix_tpu.train.losses import init_selc_table
    from pcgmix_tpu.train.steps import (
        TrainState, make_multi_step, make_optimizer, make_train_step,
    )

    if "train_ds" not in _SHARED:
        n_wavs = max(8, int(np.ceil((STEPS + 8) * BATCH / 8 * 1.15)))
        dataset = synthetic_physionet_dict(
            num_wavs_train=n_wavs, num_wavs_test=2, segments_per_wav=8,
            sig_len=SIG_LEN, seed=0,
        )
        _SHARED["train_ds"] = physionet_split(
            dataset, "train", train_balance=False
        )
        _SHARED["train_data"] = jnp.asarray(_SHARED["train_ds"].data)
        _SHARED["train_labels"] = jnp.asarray(_SHARED["train_ds"].label)
    train_ds = _SHARED["train_ds"]

    model = build_model(MODEL, train=True, compute_dtype=jnp.bfloat16,
                        conv_impl=conv_impl)
    tx = make_optimizer("adam", 0.01, 1e-4, 0.1, 10_000, use_sched=True)
    variables = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, CHANNELS, SIG_LEN), jnp.float32)
    )

    def fresh_state():
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            soft_labels=init_selc_table(train_ds.label, 2),
            step=jnp.asarray(0, jnp.int32),
        )

    def make_engine():
        return AugmentEngine(
            AugmentConfig(
                method=METHOD, batch_size=BATCH, num_channels=CHANNELS,
                sig_len=SIG_LEN, model=MODEL, use_pallas=use_pallas,
            )
        )

    train_data = _SHARED["train_data"]
    train_labels = _SHARED["train_labels"]
    key = jax.random.PRNGKey(0)

    if gang_s is None:
        engine = make_engine()
        step = make_train_step(
            model, tx, selc_es=999, engine=engine,
            train_data=train_data, train_labels=train_labels,
        )
        multi = make_multi_step(step)
        state = {"v": fresh_state()}

        def run_window(start):
            it = EpochIterator(train_ds, BATCH, seed=1, step_count=start,
                               parity="numpy", materialize_data=False)
            buf_i, buf_p, buf_s = [], [], []
            executed = 0
            for count, batch in enumerate(it):
                sc = start + count
                arr, _ = engine.plan_arrays_or_identity(
                    sc, batch["frames"], batch["label"], batch["wav"]
                )
                buf_i.append(batch["indices"]); buf_p.append(arr); buf_s.append(sc)
                if len(buf_i) == SCAN_K:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack([np.asarray(x) for x in xs]), *buf_p
                    )
                    state["v"], _ = multi(
                        state["v"], jnp.asarray(np.stack(buf_i)), stacked,
                        jnp.asarray(buf_s), 1, key,
                    )
                    buf_i, buf_p, buf_s = [], [], []
                    executed += SCAN_K
                if count + 1 >= STEPS:
                    break
            jax.block_until_ready(state["v"].params)
            return executed * BATCH

        return run_window

    # gang arm: vmapped scan over gang_s members (gang.py program shape)
    engines = [make_engine() for _ in range(gang_s)]
    raw = make_train_step(
        model, tx, selc_es=999, engine=engines[0],
        train_data=train_data, train_labels=train_labels,
    )._raw_step

    def member_multi(st, idx_seq, plan_seq, sids, epoch, rng):
        def body(s, xs):
            idx, plan, sid = xs
            return raw(s, {"indices": idx}, plan, epoch,
                       jax.random.fold_in(rng, sid))
        return jax.lax.scan(body, st, (idx_seq, plan_seq, sids))

    gang_multi = jax.jit(
        jax.vmap(member_multi, in_axes=(0, 0, 0, None, None, None)),
        donate_argnums=(0,),
    )
    s0 = fresh_state()
    state = {
        "v": jax.tree_util.tree_map(
            lambda x: jnp.repeat(jnp.asarray(x)[None], gang_s, axis=0), s0
        )
    }

    def run_window(start):
        its = [
            iter(EpochIterator(train_ds, BATCH, seed=1 + s, step_count=start,
                               parity="numpy", materialize_data=False))
            for s in range(gang_s)
        ]
        buf_i, buf_p, buf_s = [], [], []
        executed = 0
        for count in range(STEPS):
            sc = start + count
            batches = [next(it) for it in its]
            buf_i.append(np.stack([b["indices"] for b in batches]))
            plans = [
                eng.plan_arrays_or_identity(
                    sc, b["frames"], b["label"], b["wav"]
                )[0]
                for eng, b in zip(engines, batches)
            ]
            buf_p.append(jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *plans
            ))
            buf_s.append(sc)
            if len(buf_i) == SCAN_K:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs], axis=1),
                    *buf_p,
                )
                state["v"], _ = gang_multi(
                    state["v"], jnp.asarray(np.stack(buf_i, axis=1)), stacked,
                    jnp.asarray(buf_s), 1, key,
                )
                buf_i, buf_p, buf_s = [], [], []
                executed += SCAN_K
        jax.block_until_ready(state["v"].params)
        return executed * BATCH * gang_s

    return run_window


def measure(run_window, reps=3):
    run_window(0)  # compile + warm
    rates = []
    for rep in range(reps):
        t0 = time.time()
        n = run_window(8 + rep * STEPS)
        rates.append(n / (time.time() - t0))
    return rates


def ragged_overhead(gang_s: int = 8, epochs: int = 3):
    """Wall-clock of the ragged machinery at ZERO raggedness: the same
    equal-size members through train_gang's equal path vs the forced
    ragged path (every step active, so the difference is pure plumbing —
    the per-leaf jnp.where select, the inject_hyperparams surgery, and the
    per-member sid/lr/β₁ lanes).  Idle-step waste under real raggedness is
    analytic on top (the size spread; BENCH.md)."""
    from pcgmix_tpu.data import synthetic_physionet_dict
    from pcgmix_tpu.train import TrainConfig, train_gang
    from pcgmix_tpu.train.gang import _train_gang_ragged
    from pcgmix_tpu.train.loop import build_splits

    ds = synthetic_physionet_dict(
        num_wavs_train=48, num_wavs_test=4, segments_per_wav=8,
        sig_len=SIG_LEN, seed=0,
    )
    cfgs = [
        TrainConfig(
            dataset="PhysioNet", model=MODEL, method=METHOD,
            num_epochs=epochs, batch_size=BATCH, sig_len=SIG_LEN,
            train_balance=False, save_artifacts=False, loader_parity="numpy",
            compute_dtype="bfloat16", steps_per_dispatch=SCAN_K, seed=s,
        )
        for s in range(1, gang_s + 1)
    ]
    splits = [build_splits(c, ds) for c in cfgs]

    def steady(call):
        """Median post-compile per-epoch wall-clock, read from the run's
        own cumulative ``times`` series (np.diff drops epoch 1, which
        carries the compiles).  Each train_gang call builds fresh jit
        wrappers, so timing across separate calls would measure tracing/
        compile-cache lookups rather than steady state."""
        perf0 = call()[0]
        return float(np.median(np.diff(np.asarray(perf0["times"], float))))

    out = {
        "equal_s_per_epoch": round(steady(lambda: train_gang(cfgs, ds)), 3),
        "ragged_s_per_epoch": round(
            steady(lambda: _train_gang_ragged(cfgs, ds, splits)), 3
        ),
        "equal_control_s_per_epoch": round(
            steady(lambda: train_gang(cfgs, ds)), 3
        ),
    }
    out["ragged_over_equal"] = round(
        out["ragged_s_per_epoch"]
        / (0.5 * (out["equal_s_per_epoch"]
                  + out["equal_control_s_per_epoch"])),
        3,
    )
    return out


def main():
    global MODEL
    from pcgmix_tpu.utils import enable_compile_cache

    enable_compile_cache()  # warm-start the tunnel compiles across arms
    args = list(sys.argv[1:])
    if "--model" in args:
        i = args.index("--model")
        MODEL = args[i + 1]
        del args[i:i + 2]
    skip_ragged = "--skip-ragged" in args
    if skip_ragged:
        args.remove("--skip-ragged")
    pallas_only = "--pallas-gangs" in args  # sweep PALLAS gangs per size
    if pallas_only:
        args.remove("--pallas-gangs")
    conv_sweep = "--conv-sweep" in args  # A/B conv_impl xla vs matmul
    if conv_sweep:
        args.remove("--conv-sweep")
    gang_sizes = [int(x) for x in (args or ["4", "8"])]
    out = {"model": MODEL}
    if conv_sweep:
        # one process: sequential xla vs matmul, then matmul gangs per size
        # (Pallas mix on everywhere — the shipping config), interleaved
        # sequential-xla controls for tunnel drift
        results = {}
        seq_x = build(use_pallas=True, gang_s=None)
        results["seq_xla"] = measure(seq_x)
        seq_m = build(use_pallas=True, gang_s=None, conv_impl="matmul")
        results["seq_matmul"] = measure(seq_m)
        del seq_m
        for s in gang_sizes:
            for impl in ("matmul", "xla"):
                g = build(use_pallas=True, gang_s=s, conv_impl=impl)
                results[f"gang_{s}_{impl}"] = measure(g)
                del g
            results[f"seq_control_after_{s}"] = measure(seq_x, reps=2)
        base = float(np.median(results["seq_xla"]))
        for k, v in results.items():
            out[k] = {
                "samples_per_s": [round(float(x)) for x in v],
                "median": round(float(np.median(v))),
                "vs_seq_xla": round(float(np.median(v)) / base, 2),
            }
        print(json.dumps(out, indent=1))
        return
    if pallas_only:
        results = {}
        seq_p = build(use_pallas=True, gang_s=None)
        results["seq_pallas_on"] = measure(seq_p)
        for s in gang_sizes:
            g = build(use_pallas=True, gang_s=s)
            results[f"gang_{s}_pallas"] = measure(g)
            del g
            results[f"seq_control_after_{s}"] = measure(seq_p, reps=2)
        base = float(np.median(results["seq_pallas_on"]))
        for k, v in results.items():
            out[k] = {
                "samples_per_s": [round(float(x)) for x in v],
                "median": round(float(np.median(v))),
            }
            if k.startswith("gang_"):
                out[k]["speedup_vs_seq_pallas"] = round(
                    float(np.median(v)) / base, 2
                )
        print(json.dumps(out, indent=1))
        return
    # ragged probe FIRST: it builds its own corpus + gang states, so it gets
    # the cleanest HBM (a previous ordering OOMed here after all the arms)
    if not skip_ragged:
        try:
            out["ragged_overhead"] = ragged_overhead(gang_sizes[-1])
        except Exception as e:  # noqa: BLE001 - record, don't lose the arms
            out["ragged_overhead_error"] = f"{type(e).__name__}: {e}"[:300]
    results = {}
    seq = build(use_pallas=False, gang_s=None)
    results["seq_pallas_off"] = measure(seq)
    for s in gang_sizes:
        g = build(use_pallas=False, gang_s=s)
        results[f"gang_{s}"] = measure(g)
        del g  # drop the arm's stacked state before the next build
        # interleaved control: has the tunnel drifted?
        results[f"seq_control_after_gang_{s}"] = measure(seq, reps=2)
    seq_p = build(use_pallas=True, gang_s=None)
    results["seq_pallas_on"] = measure(seq_p)
    del seq_p
    # experimental: vmap-batched Pallas mix kernels inside the gang (works
    # in interpret mode; the real Mosaic lowering may reject the batched
    # grid — record the outcome either way)
    gang_pallas_error = None
    try:
        gp = build(use_pallas=True, gang_s=gang_sizes[-1])
        results[f"gang_{gang_sizes[-1]}_pallas"] = measure(gp)
        del gp
    except Exception as e:  # noqa: BLE001 - record, don't crash the bench
        gang_pallas_error = f"{type(e).__name__}: {e}"

    if gang_pallas_error:
        out["gang_pallas_error"] = gang_pallas_error[:300]
    base = float(np.median(results["seq_pallas_off"]))
    for k, v in results.items():
        out[k] = {
            "samples_per_s": [round(float(x)) for x in v],
            "median": round(float(np.median(v))),
        }
        if k.startswith("gang_"):
            out[k]["speedup_vs_seq"] = round(float(np.median(v)) / base, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
