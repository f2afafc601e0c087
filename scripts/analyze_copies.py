"""HLO copy-op census for the production train step (BENCH.md's 12%
`copy-done` line item): compile the bf16 bench step for the attached TPU,
parse the optimized HLO, and bucket every copy/transpose instruction by
shape so the layout-copy cost can be attributed to a specific boundary.

Usage: python scripts/analyze_copies.py [scan_k]
"""

from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def _bytes_of(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    unit = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
            "s64": 8, "u8": 1, "s8": 1}.get(dtype, 4)
    return n * unit


def main():
    import jax.numpy as jnp

    bench._enable_compile_cache()
    train_ds = bench._make_batches(8)
    engine, step, state, key = bench._build(train_ds, "bfloat16")

    labels = np.zeros(bench.BATCH, np.int64)
    frames = np.tile(
        np.linspace(0, bench.SIG_LEN - 1, 5).astype(np.int64), (bench.BATCH, 1)
    )
    wavs = np.zeros(bench.BATCH, np.int64)
    plan = engine.plan(0, frames, labels, wavs)
    dev_batch = {"indices": jnp.zeros(bench.BATCH, jnp.int32)}
    compiled = step.lower(state, dev_batch, plan.arrays, 1, key).compile()
    hlo = compiled.as_text()

    copies = collections.Counter()
    copy_bytes = collections.Counter()
    for line in hlo.splitlines():
        line = line.strip()
        if " copy(" in line and "=" in line:
            shape = line.split("=", 1)[1].strip().split(" ")[0]
            copies[shape] += 1
            copy_bytes[shape] += _bytes_of(shape)
        elif " transpose(" in line and "=" in line:
            shape = "T:" + line.split("=", 1)[1].strip().split(" ")[0]
            copies[shape] += 1
            copy_bytes[shape] += _bytes_of(shape)

    total = sum(copy_bytes.values())
    print(f"\n== copy/transpose census ({sum(copies.values())} ops, "
          f"{total/1e6:.2f} MB touched) ==")
    for shape, n in sorted(copies.items(), key=lambda kv: -copy_bytes[kv[0]])[:25]:
        print(f"  {n:4d} x {shape:40s} {copy_bytes[shape]/1e6:8.3f} MB")


if __name__ == "__main__":
    main()
