"""steps_per_dispatch training path: scan chunks + partial-chunk fallback."""

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_physionet_dict
from pcgmix_tpu.train import TrainConfig, train_model

DS = synthetic_physionet_dict(
    num_wavs_train=20, num_wavs_test=6, segments_per_wav=3, sig_len=320, seed=4
)


def _cfg(**kw):
    base = dict(
        dataset="PhysioNet", model="resnet9-5k", method="durmixmagwarp(0.2,4)+0.5",
        num_epochs=3, batch_size=8, sig_len=320, save_artifacts=False,
        loader_parity="numpy",
    )
    base.update(kw)
    return TrainConfig(**base)


def test_scan_loop_matches_single_dispatch():
    perf1 = train_model(_cfg(), DS)
    perf2 = train_model(_cfg(steps_per_dispatch=3), DS)  # uneven → partial chunk
    # identical plans + identical RNG folding ⇒ identical training trajectory
    np.testing.assert_allclose(perf2["train_loss"], perf1["train_loss"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(perf2["test_accuracy"], perf1["test_accuracy"])
    np.testing.assert_array_equal(perf2["steps"], perf1["steps"])


def test_scan_loop_base_method():
    perf = train_model(_cfg(method="base", steps_per_dispatch=4), DS)
    assert np.isfinite(perf["train_loss"]).all()
    assert perf["train_loss"][-1] < perf["train_loss"][0]
