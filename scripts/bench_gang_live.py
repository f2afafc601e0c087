"""Live-model gang A/B on the real chip: S seed-grid members of a
LIVE-model method (lc-nointrusion / saliency-cutmix) trained sequentially
via train_model vs one gang program (train/gang.py live_mode).

Why this is the interesting case: these methods pay a device→host round
trip EVERY step in a standalone run (candidate-loss pull / saliency-bin
pull before the plan can exist) — over the tunneled chip that sync costs
~100-300 ms, dwarfing the small-model step itself.  The gang collapses S
of those syncs into ONE vmapped scoring dispatch + one pull per step, so
the expected win is larger than for plan-only methods.

Discipline (BENCH.md): ONE process, interleaved sequential controls,
median post-compile per-epoch wall-clock read from each run's own
cumulative ``times`` series (np.diff drops the compile epoch).

Usage: python scripts/bench_gang_live.py [--model Potes] [--method
saliency-cutmix] [sizes...]
"""

from __future__ import annotations

import json
import sys

import numpy as np

BATCH = 64
SIG_LEN = 2500
MODEL = "Potes"   # the gang-thesis model (130k params, MXU idle at b64)
METHOD = "lc-nointrusion"
EPOCHS = 3        # epoch 1 carries the compiles; diff leaves >=2 samples


def _corpus(n_wavs_train: int):
    from pcgmix_tpu.data import synthetic_physionet_dict

    return synthetic_physionet_dict(
        num_wavs_train=n_wavs_train, num_wavs_test=4, segments_per_wav=8,
        sig_len=SIG_LEN, seed=0,
    )


def _cfgs(gang_s: int):
    from pcgmix_tpu.train import TrainConfig

    return [
        TrainConfig(
            dataset="PhysioNet", model=MODEL, method=METHOD,
            num_epochs=EPOCHS, batch_size=BATCH, sig_len=SIG_LEN,
            train_balance=False, save_artifacts=False, loader_parity="numpy",
            compute_dtype="bfloat16", seed=s,
        )
        for s in range(1, gang_s + 1)
    ]


def _epoch_time(perf: dict) -> float:
    return float(np.median(np.diff(np.asarray(perf["times"], float))))


def main():
    global MODEL, METHOD
    args = list(sys.argv[1:])
    for flag, glob in (("--model", "MODEL"), ("--method", "METHOD")):
        if flag in args:
            i = args.index(flag)
            globals()[glob] = args[i + 1]
            del args[i:i + 2]
    sizes = [int(x) for x in (args or ["4", "8"])]

    from pcgmix_tpu.train import train_gang, train_model

    ds = _corpus(max(48, int(np.ceil(8 * BATCH / 8 * 1.2))))
    out = {"model": MODEL, "method": METHOD, "batch": BATCH,
           "epochs": EPOCHS}

    # sequential arm: one member trained via train_model (the runner's
    # fallback path), steady-state epoch seconds -> samples/s
    seq_cfg = _cfgs(1)[0]
    perf = train_model(seq_cfg, ds)
    spe = perf["steps"][-1] / perf["epochs"][-1]
    seq_epoch_s = _epoch_time(perf)
    seq_sps = spe * BATCH / seq_epoch_s
    out["seq"] = {"epoch_s": round(seq_epoch_s, 3),
                  "samples_per_s": round(seq_sps)}

    for s_count in sizes:
        gang_perfs = train_gang(_cfgs(s_count), ds)
        g_epoch_s = _epoch_time(gang_perfs[0])
        g_sps = spe * BATCH * s_count / g_epoch_s
        out[f"gang_{s_count}"] = {
            "epoch_s": round(g_epoch_s, 3),
            "aggregated_samples_per_s": round(g_sps),
            "speedup_vs_seq": round(g_sps / seq_sps, 2),
        }
        # interleaved control: has the tunnel drifted?
        perf_c = train_model(seq_cfg, ds)
        out[f"seq_control_after_{s_count}"] = {
            "epoch_s": round(_epoch_time(perf_c), 3),
            "samples_per_s": round(spe * BATCH / _epoch_time(perf_c)),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
