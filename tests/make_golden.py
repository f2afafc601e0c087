"""Generate golden fixtures freezing the engine's bit-exact behavior.

Run from the repo root (CPU backend):  python tests/make_golden.py
Writes tests/golden/engine_v1.npz consumed by test_golden_plans.py — any
future refactor that changes plan RNG or kernel arithmetic will trip it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The env var alone is not enough here: the ambient environment presets a
# TPU platform and overrides it.  Force CPU before any backend init so the
# fixtures carry CPU fp32 arithmetic (what the test suite compares against).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_cases():
    import jax.numpy as jnp

    from pcgmix_tpu.augment import AugmentEngine
    from pcgmix_tpu.augment.engine import AugmentConfig

    B, C, T = 8, 4, 512
    rng = np.random.default_rng(20260816)
    data = rng.normal(size=(B, C, T)).astype(np.float32)
    lens = rng.integers(10, 60, size=(B, 4))
    frames = np.zeros((B, 5), np.int64)
    frames[:, 1:] = np.cumsum(lens, axis=1)
    for i in range(B):
        data[i, :, frames[i, -1]:] = 0.0
    labels = np.array([0, 1] * (B // 2))
    target = np.eye(2, dtype=np.float32)[labels]
    wavs = [f"{'ab'[i % 2]}w{i:03d}" for i in range(B)]

    methods = [
        "durratiomixup", "(rand)durratiomixup", "durmixmagwarp(0.2,4)",
        "durratiocutmix", "mixup(same)", "mixup(mix)", "timemask(0.2)",
        "labelcutmix", "(smooth)labelcutmix", "swapsysdia", "cont-cutmix",
        "cutout", "s1s2mask", "lengthcutmix(5bins)", "magnitudewarp(0.2,4)",
        "timewarp(0.05,2)", "respiratoryscale(12,20)", "cutmix", "cutmix(ch)",
        "wavcutmix", "datasetcutmix",
    ]
    out = {"data": data, "frames": frames, "labels": labels}
    for m in methods:
        eng = AugmentEngine(AugmentConfig(m, B, C, T, model="resnet9"))
        plan = eng.plan(37, frames, labels, wavs)
        applied, tgt = eng.apply(jnp.asarray(data), jnp.asarray(target), plan.arrays)
        key = m.replace("(", "_").replace(")", "_").replace(",", "-")
        out[f"out::{key}"] = np.asarray(applied)
        out[f"tgt::{key}"] = np.asarray(tgt)
    return out, methods


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "golden"), exist_ok=True)
    cases, methods = build_cases()
    path = os.path.join(here, "golden", "engine_v1.npz")
    np.savez_compressed(path, **cases)
    print(f"wrote {path} ({len(methods)} methods)")
