"""A/B: does removing the stage-3 flatten transpose (the largest layout
copy in the step HLO — 2x bf16[64,512,78] ≈ 10 MB/step, see
analyze_copies.py) buy measurable throughput?

Variant A: current flatten_torch (transpose to channel-major, torch parity).
Variant B: plain time-major reshape (same FLOPs; weight-order permutation
is immaterial for a throughput A/B).

Both run in ONE process (same tunnel conditions), bf16 + pallas + scan_k=8
— the production headline config.  Run: python scripts/bench_flatten.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "scripts")

import jax.numpy as jnp  # noqa: E402

from bench_experiments import run  # noqa: E402


def main():
    import pcgmix_tpu.models.resnet9 as r9

    orig = r9.flatten_torch
    out = {}
    for name, flat in (
        ("A_flatten_torch", orig),
        ("B_plain_reshape", lambda x: x.reshape(x.shape[0], -1)),
    ):
        r9.flatten_torch = flat
        try:
            res = run("bfloat16", 8, True, steps=48, reps=4)
        finally:
            r9.flatten_torch = orig
        out[name] = res
        print(json.dumps({name: res}), flush=True)
    a, b = out["A_flatten_torch"]["median"], out["B_plain_reshape"]["median"]
    print(json.dumps({"speedup_B_over_A": b / a}), flush=True)


if __name__ == "__main__":
    main()
