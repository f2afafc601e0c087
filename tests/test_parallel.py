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


def test_train_model_dp_multi_epoch_matches_single_device():
    """The integrated path (VERDICT r1 missing #1): train_model itself builds
    the mesh (TrainConfig.n_devices), shards batches/plans/eval, and a
    multi-epoch 8-device run reproduces the single-device performance dict.
    Also asserts the mesh path is genuinely active: the replicated train
    state and sharded batches land on all 8 devices."""
    from pcgmix_tpu import parallel as par
    from pcgmix_tpu.data import synthetic_physionet_dict
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=8, segments_per_wav=3,
        sig_len=T, seed=7,
    )
    # lr_max 0.001 keeps this tiny config out of the chaotic regime where
    # psum-order fp noise amplifies past any meaningful tolerance by epoch 4
    kw = dict(
        dataset="PhysioNet", model="resnet9-5k",
        method="durmixmagwarp(0.2,4)+0.8", num_epochs=4, batch_size=B,
        sig_len=T, lr_max=0.001, save_artifacts=False, loader_parity="numpy",
    )
    p1 = train_model(TrainConfig(n_devices=1, **kw), ds)

    seen = {"replicated_ndev": 0, "sharded": 0}
    orig_replicate, orig_shard = par.replicate, par.shard_batch

    def spy_replicate(tree, mesh):
        out = orig_replicate(tree, mesh)
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            seen["replicated_ndev"] = max(
                seen["replicated_ndev"], len(leaves[0].sharding.device_set)
            )
        return out

    def spy_shard(tree, mesh, axis="data"):
        out = orig_shard(tree, mesh, axis)
        for leaf in jax.tree_util.tree_leaves(out):
            if not leaf.sharding.is_fully_replicated:
                seen["sharded"] += 1
        return out

    par.replicate, par.shard_batch = spy_replicate, spy_shard
    try:
        p8 = train_model(TrainConfig(n_devices=8, **kw), ds)
    finally:
        par.replicate, par.shard_batch = orig_replicate, orig_shard

    assert seen["replicated_ndev"] == 8, "train state not replicated over the mesh"
    assert seen["sharded"] > 0, "no batch upload was actually sharded"
    # the single-STEP equivalence above is tight (rtol 1e-5); over 4 epochs
    # psum-order fp noise compounds, so epoch-level losses get a looser bar
    for k in ("train_loss", "test_loss"):
        np.testing.assert_allclose(p1[k], p8[k], rtol=2e-3, atol=1e-4, err_msg=k)
    # atol 2.0: a single borderline segment flipping its argmax under the
    # drifted logits moves a tiny-epoch accuracy by 1/64 = 1.5625 points
    for k in ("train_accuracy", "test_accuracy", "test_f1"):
        np.testing.assert_allclose(p1[k], p8[k], atol=2.0, err_msg=k)
    assert p1["steps"] == p8["steps"] and p1["epochs"] == p8["epochs"]


def test_scan_dispatch_composes_with_dp_mesh():
    """steps_per_dispatch>1 under TrainConfig.n_devices>1: the scanned
    multi-step runs on the sharded state and reproduces the plain
    single-device run's performance dict (fp tolerance)."""
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=6, segments_per_wav=2,
        sig_len=T, seed=8,
    )
    # lr_max kept low: at the default 0.01 this tiny config is in a
    # chaotic regime where even single-device scan-vs-perstep fp noise
    # amplifies to % level by epoch 2 (reduction order, fusion order)
    kw = dict(
        dataset="PhysioNet", model="resnet9-5k",
        method="durmixmagwarp(0.2,4)+0.8", num_epochs=2, batch_size=B,
        sig_len=T, lr_max=0.001, save_artifacts=False, loader_parity="numpy",
    )
    ref = train_model(TrainConfig(n_devices=1, steps_per_dispatch=1, **kw), ds)
    got = train_model(TrainConfig(n_devices=4, steps_per_dispatch=2, **kw), ds)
    # epoch 1 agrees to ~6 digits; epoch 2 carries compounded fp drift
    # from the different program structure (scan fusion + psum order)
    np.testing.assert_allclose(
        got["train_loss"], ref["train_loss"], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        got["test_accuracy"], ref["test_accuracy"], atol=1.0
    )


def test_pallas_engine_path_matches_xla_under_mesh():
    """ROADMAP round-2 item: under a DP mesh the Pallas kernels run through
    shard_map with XLA pre-gathered partner rows.  Engine apply with
    use_pallas+mesh (interpret mode on the CPU mesh) must equal the plain
    XLA path bit-closely for keepdur, fused-magwarp and concat methods."""
    rng = np.random.default_rng(3)
    mesh = make_mesh(8)
    from pcgmix_tpu.data.synthetic import synthetic_physionet_dict as _  # noqa: F401

    ds = synthetic_physionet_dict(
        num_wavs_train=12, num_wavs_test=2, segments_per_wav=2, sig_len=T, seed=6
    )
    train_ds = physionet_split(ds, "train", train_balance=False)
    idx = np.arange(B) % len(train_ds)
    data = jnp.asarray(train_ds.data[idx].astype(np.float32))
    tgt = jnp.asarray(np.eye(2, dtype=np.float32)[train_ds.label[idx]])
    for method in ("durratiomixup", "durmixmagwarp(0.2,4)", "cutmix"):
        def mk(**kw):
            return AugmentEngine(AugmentConfig(
                method, B, C, T, model="resnet9-5k", **kw))

        eng_x = mk()
        eng_p = mk(use_pallas=True, mesh=mesh, pallas_interpret=True)
        plan_x = eng_x.plan(5, train_ds.frames[idx], train_ds.label[idx])
        plan_p = eng_p.plan(5, train_ds.frames[idx], train_ds.label[idx])
        out_x, tgt_x = eng_x.apply(data, tgt, plan_x.arrays)
        out_p, tgt_p = eng_p.apply(data, tgt, plan_p.arrays)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), rtol=1e-6, atol=1e-6,
            err_msg=method,
        )
        np.testing.assert_allclose(
            np.asarray(tgt_p), np.asarray(tgt_x), rtol=1e-6, err_msg=method
        )


def test_pallas_train_model_under_dp_mesh():
    """Full train_model with n_devices=4 and the Pallas path enabled
    (interpret mode) reproduces the XLA-path run."""
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=6, segments_per_wav=2,
        sig_len=T, seed=8,
    )
    kw = dict(
        dataset="PhysioNet", model="resnet9-5k",
        method="durmixmagwarp(0.2,4)+0.8", num_epochs=2, batch_size=B,
        sig_len=T, lr_max=0.001, save_artifacts=False, loader_parity="numpy",
        n_devices=4,
    )
    ref = train_model(TrainConfig(use_pallas=False, **kw), ds)
    got = train_model(
        TrainConfig(use_pallas=True, pallas_interpret=True, **kw), ds
    )
    np.testing.assert_allclose(
        got["train_loss"], ref["train_loss"], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        got["test_accuracy"], ref["test_accuracy"], atol=1.0
    )


def test_production_config_mesh_scan_pallas_matches_single_device():
    """The full production fast config — DP mesh AND K-step scan dispatch
    AND the Pallas mix path together (what dryrun_multichip and the bench
    headline ship) — reproduces the plain single-device XLA run.  The
    pairwise combinations are covered above; this pins the triple."""
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=6, segments_per_wav=2,
        sig_len=T, seed=8,
    )
    kw = dict(
        dataset="PhysioNet", model="resnet9-5k",
        method="durmixmagwarp(0.2,4)+0.8", num_epochs=2, batch_size=B,
        sig_len=T, lr_max=0.001, save_artifacts=False, loader_parity="numpy",
    )
    ref = train_model(
        TrainConfig(n_devices=1, steps_per_dispatch=1, use_pallas=False, **kw),
        ds,
    )
    got = train_model(
        TrainConfig(n_devices=4, steps_per_dispatch=2, use_pallas=True,
                    pallas_interpret=True, **kw),
        ds,
    )
    np.testing.assert_allclose(
        got["train_loss"], ref["train_loss"], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        got["test_accuracy"], ref["test_accuracy"], atol=1.0
    )


def test_zoo_model_under_dp_mesh():
    """A tsai-zoo family composes with the integrated DP mesh: a 4-device
    InceptionTime run reproduces the single-device metrics (same tolerance
    rationale as the resnet9 multi-epoch case)."""
    from pcgmix_tpu.data import synthetic_physionet_dict
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=6, segments_per_wav=2,
        sig_len=T, seed=11,
    )
    kw = dict(
        dataset="PhysioNet", model="InceptionTime",
        method="durratiomixup", num_epochs=2, batch_size=B,
        sig_len=T, lr_max=0.001, save_artifacts=False, loader_parity="numpy",
    )
    p1 = train_model(TrainConfig(n_devices=1, **kw), ds)
    p4 = train_model(TrainConfig(n_devices=4, **kw), ds)
    np.testing.assert_allclose(
        p1["train_loss"], p4["train_loss"], rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        p1["test_accuracy"][-1], p4["test_accuracy"][-1], atol=1.0
    )
