"""Campaign-level gang A/B on the real chip: the FULL runner path
(exp.runner.run_grid → train_model/train_gang, host planning, recording-
level eval at the 11 plot epochs, performance.pkl + final weights per run
dir) for an S-member seed grid, sequential vs --gang.

This is one evidence tier above scripts/bench_gang.py (which isolates the
steady-state train-step throughput): here the measured quantity is the
wall-clock of the whole mini-campaign, the thing the reference's
sequential notebook loop (experiments_timeseries.ipynb cell 13 — ~10
seed-grid members trained back-to-back per grid point) actually spends.
Ganging helps this number twice: the vmapped step processes all members
per dispatch AND the campaign pays ONE compile + one eval sweep per plot
epoch instead of S.

Discipline (BENCH.md): ONE process, interleaved arm reps
(seq, gang, seq, gang, ...), fresh experiments_root per rep (no
resume-skip), persistent XLA compile cache on (train_model/train_gang
enable it themselves) so rep 0 carries at most warm-start compile cost.
Rep 0 of each arm is reported separately as the cold row; the headline is
the median over reps >= 1.

Usage (on the chip):
  python scripts/bench_campaign.py --model Potes --members 8 --reps 3
  python scripts/bench_campaign.py --model resnet9 --members 4 --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, SIG_LEN = 64, 2500
METHOD = "durmixmagwarp(0.2,4)"

_SHARED: dict = {}


def _dataset(num_epochs: int):
    """One synthetic corpus shared by every arm/rep (host RAM, reused)."""
    if "ds" not in _SHARED:
        from pcgmix_tpu.data import synthetic_physionet_dict

        # 256 wavs x 8 segments = 2048 train rows -> 32 steps/epoch at
        # batch 64; 16 test wavs keep the recording-level eval real but
        # cheap.  Sized so the steady-state compute is seconds and the
        # campaign overheads (per-run compile, host planning, eval) are
        # visible — the regime the reference's grid loop lives in.
        _SHARED["ds"] = synthetic_physionet_dict(
            num_wavs_train=256, num_wavs_test=16, segments_per_wav=8,
            sig_len=SIG_LEN, seed=0,
        )
    return _SHARED["ds"]


def _base_cfg(model: str, num_epochs: int, root: str):
    from pcgmix_tpu.train import TrainConfig

    return TrainConfig(
        dataset="PhysioNet", model=model, method=METHOD,
        num_epochs=num_epochs, batch_size=BATCH, sig_len=SIG_LEN,
        n_fraction=1.0, experiments_root=root, train_balance=False,
        loader_parity="numpy", plot=False, save_artifacts=True,
        eval_batch_size=256,
        # production fast config (BENCH.md headline): bf16 + 8-step scan
        compute_dtype="bfloat16", steps_per_dispatch=8,
    )


def run_arm(model: str, members: int, num_epochs: int, gang: bool) -> dict:
    """One full mini-campaign; returns wall-clock + integrity counts."""
    import glob
    import os

    from pcgmix_tpu.exp.runner import run_grid

    ds = _dataset(num_epochs)
    root = tempfile.mkdtemp(prefix=f"campaign_{'gang' if gang else 'seq'}_")
    try:
        t0 = time.perf_counter()
        ran = run_grid(
            _base_cfg(model, num_epochs, root), ds,
            methods=[METHOD], n_fractions=[1.0], seeds=list(range(1, members + 1)),
            seed_datas=[1100001], robust=False, skip_done=False,
            progress=False, gang=gang, gang_max_size=0,
        )
        wall = time.perf_counter() - t0
        perfs = glob.glob(os.path.join(root, "*", "performance.pkl"))
        finals = glob.glob(os.path.join(root, "*", "model.msgpack"))
        return {
            "wall_s": round(wall, 2),
            "runs": len(ran),
            "performance_pkls": len(perfs),
            "final_ckpts": len(finals),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Potes")
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    rows = {"seq": [], "gang": []}
    for rep in range(args.reps):
        for arm, gang in (("seq", False), ("gang", True)):
            r = run_arm(args.model, args.members, args.epochs, gang)
            r["rep"] = rep
            rows[arm].append(r)
            print(f"[rep {rep}] {arm:4s}: {r}", flush=True)
            expected = args.members
            assert (
                r["runs"] == expected
                and r["performance_pkls"] == expected
                and r["final_ckpts"] == expected
            ), f"incomplete campaign: {r}"

    def steady(arm):
        vals = [r["wall_s"] for r in rows[arm][1:]] or [rows[arm][0]["wall_s"]]
        return float(np.median(vals))

    out = {
        "model": args.model,
        "members": args.members,
        "epochs": args.epochs,
        "platform": platform,
        "method": METHOD,
        "reps": rows,
        "cold_seq_s": rows["seq"][0]["wall_s"],
        "cold_gang_s": rows["gang"][0]["wall_s"],
        "steady_seq_s": steady("seq"),
        "steady_gang_s": steady("gang"),
        "cold_speedup": round(
            rows["seq"][0]["wall_s"] / rows["gang"][0]["wall_s"], 3
        ),
        "steady_speedup": round(steady("seq") / steady("gang"), 3),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
