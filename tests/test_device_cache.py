"""Process-level device-corpus cache (data/device_cache.py): content
addressing, LRU bound, and bit-identical training with the cache on/off.

Motivation (BENCH.md campaign table): a grid campaign re-stages the same
corpus per member; the reference streams host tensors instead
(train_model.py:418-470) so this transfer tax has no reference
counterpart and must be provably removable without changing results.
"""

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.data import device_cache
from pcgmix_tpu.train import TrainConfig, train_model


@pytest.fixture(autouse=True)
def _fresh_cache():
    device_cache.clear()
    yield
    device_cache.clear()


def test_content_addressed_reuse():
    a = np.arange(4096, dtype=np.float32).reshape(16, 256)
    d1 = device_cache.device_array(a)
    d2 = device_cache.device_array(a.copy())  # fresh identity, same bytes
    assert d1 is d2
    assert device_cache.stats() == {"hits": 1, "misses": 1}
    np.testing.assert_array_equal(np.asarray(d1), a)


def test_distinct_content_distinct_buffers():
    a = np.zeros((8, 8), np.float32)
    b = np.ones((8, 8), np.float32)
    c = np.zeros((8, 8), np.float64)  # same bytes length, different dtype
    out = {id(device_cache.device_array(x)) for x in (a, b, c)}
    assert len(out) == 3
    assert device_cache.stats()["misses"] == 3


def test_lru_bound(monkeypatch):
    monkeypatch.setattr(device_cache, "MAX_ENTRIES", 2)
    arrs = [np.full((4,), i, np.float32) for i in range(3)]
    first = device_cache.device_array(arrs[0])
    device_cache.device_array(arrs[1])
    device_cache.device_array(arrs[2])  # evicts arrs[0]
    again = device_cache.device_array(arrs[0])
    assert again is not first
    assert device_cache.stats() == {"hits": 0, "misses": 4}


def test_non_numpy_falls_through():
    import jax.numpy as jnp

    dev = jnp.arange(8)
    assert device_cache.device_array(dev) is not None
    assert device_cache.stats()["misses"] == 0


def test_runner_cli_no_device_cache(tmp_path):
    """--no-device-cache threads through to TrainConfig: the whole grid
    run leaves the cache untouched."""
    from pcgmix_tpu import utils
    from pcgmix_tpu.exp.runner import main

    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=6, segments_per_wav=2,
        sig_len=256, seed=1,
    )
    dat = tmp_path / "p.dat"
    utils.dict2file(ds, str(dat))
    main([
        "--dataset-file", str(dat), "--methods", "base",
        "--n-fractions", "1.0", "--seeds", "1", "--seed-datas", "1100001",
        "--model", "resnet9-5k", "--num-epochs", "1", "--batch-size", "8",
        "--no-robust", "--experiments-root", str(tmp_path / "exp"),
        "--sig-len", "256", "--eval-batch-size", "16", "--n-devices", "1",
        "--no-device-cache",
    ])
    assert device_cache.stats() == {"hits": 0, "misses": 0}


def _cfg(seed, cache):
    return TrainConfig(
        model="resnet9-5k", method="durmixmagwarp(0.2,4)", num_epochs=2,
        batch_size=8, sig_len=256, save_artifacts=False,
        loader_parity="numpy", plot=False, device_cache=cache, seed=seed,
    )


def test_train_model_bit_identical_with_cache():
    """Two grid members (seed 1, seed 2) with the cache, vs the same runs
    without: per-epoch losses/accuracies must match EXACTLY — the cache may
    only remove transfers, never touch values.  The second cached member
    must re-upload nothing (zero new misses on the corpus + eval arrays)."""
    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=6, segments_per_wav=2,
        sig_len=256, seed=1,
    )
    cached = [train_model(_cfg(s, True), ds) for s in (1, 2)]
    after_first_stats = device_cache.stats()
    assert after_first_stats["hits"] > 0, "second member never hit the cache"
    baseline_misses = after_first_stats["misses"]
    # a third member with a seed seen before: zero additional uploads
    train_model(_cfg(1, True), ds)
    assert device_cache.stats()["misses"] == baseline_misses
    device_cache.clear()
    plain = [train_model(_cfg(s, False), ds) for s in (1, 2)]
    assert device_cache.stats() == {"hits": 0, "misses": 0}
    for c, p in zip(cached, plain):
        np.testing.assert_array_equal(
            np.asarray(c["train_loss"]), np.asarray(p["train_loss"])
        )
        np.testing.assert_array_equal(
            np.asarray(c["test_accuracy"]), np.asarray(p["test_accuracy"])
        )
