"""Data-parallel mesh path: sharded step ≡ single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
from pcgmix_tpu.data import physionet_split, synthetic_physionet_dict
from pcgmix_tpu.models import build_model
from pcgmix_tpu.parallel import make_dp_train_step, make_mesh, replicate, shard_batch
from pcgmix_tpu.train.losses import init_selc_table
from pcgmix_tpu.train.steps import TrainState, make_optimizer, make_train_step

B, C, T = 16, 4, 320


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_physionet_dict(
        num_wavs_train=12, num_wavs_test=2, segments_per_wav=2, sig_len=T, seed=6
    )
    train_ds = physionet_split(ds, "train", train_balance=False)
    model = build_model("resnet9-5k", train=True)
    tx = make_optimizer("adam", 0.01, 1e-4, 0.1, 10, True)
    v = model.init(jax.random.PRNGKey(4), jnp.zeros((1, C, T), jnp.float32))

    def fresh():
        cp = jax.tree_util.tree_map(jnp.array, v)
        return TrainState(
            cp["params"], cp.get("batch_stats", {}), tx.init(cp["params"]),
            init_selc_table(train_ds.label, 2), jnp.asarray(0, jnp.int32),
        )

    eng = AugmentEngine(AugmentConfig("durratiomixup", B, C, T, model="resnet9-5k"))
    # selc_es=0 with epoch=1 exercises the SELC soft-label scatter under
    # sharding (SURVEY.md §7 "SELC + per-example indices under sharding")
    step = make_train_step(model, tx, selc_es=0, engine=eng, donate=False)
    idx = np.arange(B) % len(train_ds)
    plan = eng.plan(0, train_ds.frames[idx], train_ds.label[idx])
    batch = {
        "data": train_ds.data[idx].astype(np.float32),
        "target_ohe": np.eye(2, dtype=np.float32)[train_ds.label[idx]],
        "indices": idx.astype(np.int64),
    }
    return fresh, step, plan, batch


def test_dp_step_matches_single_device(setup):
    fresh, step, plan, batch = setup
    rng = jax.random.PRNGKey(0)

    # single device
    st1, out1 = step(
        fresh(), {k: jnp.asarray(v) for k, v in batch.items()},
        plan.arrays, 1, rng,
    )

    # 8-device data-parallel mesh (batch and plan sharded, state replicated)
    mesh = make_mesh(8)
    dp = make_dp_train_step(step, mesh)
    st2, out2 = dp(
        replicate(fresh(), mesh),
        shard_batch(batch, mesh),
        shard_batch(plan.arrays, mesh),
        1,
        rng,
    )
    np.testing.assert_allclose(float(out2["loss"]), float(out1["loss"]),
                               rtol=1e-5, atol=1e-6)
    k1 = np.asarray(st1.params["linear"]["Dense_0"]["kernel"])
    k2 = np.asarray(st2.params["linear"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(k2, k1, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out2["preds"]),
                                  np.asarray(out1["preds"]))
    # SELC table update (a scatter by global sample index) is identical,
    # and actually happened (epoch 1 > es 0 activates the EMA write)
    np.testing.assert_allclose(
        np.asarray(st2.soft_labels), np.asarray(st1.soft_labels),
        rtol=1e-5, atol=1e-6,
    )
    assert not np.allclose(np.asarray(st1.soft_labels),
                           np.asarray(fresh().soft_labels))
