"""conv_impl="matmul": shifted-dot_general convolutions.

The gang fast path for weight-batched (vmapped) models: XLA lowers a
vmapped `nn.Conv` to a block-diagonal grouped convolution that underuses
the MXU (BENCH.md gang table — ResNet9 gangs measured 0.79-0.91x
sequential), while the same contraction written as K shifted matmuls
lowers to native batched dot_generals.  These tests pin that the two
impls are the SAME model: identical param tree, identical init draws,
forward/grad parity to float-reassociation level, and correct behavior
under weight-vmap (the gang shape).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from pcgmix_tpu.models import build_model
from pcgmix_tpu.models.layers import Conv1d


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 4, 300)), jnp.float32
    )


@pytest.mark.parametrize("name", ["resnet9-50k", "Potes"])
def test_same_params_same_forward(name, x):
    m_xla = build_model(name, train=False)
    m_mm = build_model(name, train=False, conv_impl="matmul")
    v_xla = m_xla.init(jax.random.PRNGKey(4), x)
    v_mm = m_mm.init(jax.random.PRNGKey(4), x)
    assert jax.tree_util.tree_structure(v_xla) == jax.tree_util.tree_structure(v_mm)
    for a, b in zip(jax.tree_util.tree_leaves(v_xla), jax.tree_util.tree_leaves(v_mm)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_xla = m_xla.apply(v_xla, x)
    y_mm = m_mm.apply(v_mm, x)  # same params by the equality above
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_mm),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "kernel_size,stride,padding",
    [(3, 1, 1), (5, 1, 1), (3, 1, "SAME"), (8, 1, "SAME"), (4, 2, 1),
     (1, 1, "SAME"), (3, 3, 0)],
)
def test_conv1d_layer_parity(kernel_size, stride, padding):
    xx = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 37, 5)), jnp.float32
    )
    kw = dict(features=7, kernel_size=kernel_size, padding=padding,
              stride=stride)
    c_xla = Conv1d(**kw)
    c_mm = Conv1d(**kw, impl="matmul")
    v = c_xla.init(jax.random.PRNGKey(0), xx)
    y_xla = c_xla.apply(v, xx)
    y_mm = c_mm.apply(v, xx)
    assert y_xla.shape == y_mm.shape
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_mm),
                               rtol=1e-5, atol=1e-5)


def test_strided_same_guard():
    xx = jnp.zeros((1, 16, 2), jnp.float32)
    with pytest.raises(ValueError, match="stride 1"):
        Conv1d(features=3, kernel_size=3, padding="SAME", stride=2,
               impl="matmul").init(jax.random.PRNGKey(0), xx)


def test_grad_parity(x):
    """Gradients agree to reassociation level.  Conv biases feeding a
    BatchNorm have mathematically ZERO gradient (BN subtracts the mean), so
    their float-noise values are compared with an absolute tolerance."""
    m_xla = build_model("resnet9-50k", train=True)
    m_mm = build_model("resnet9-50k", train=True, conv_impl="matmul")
    v = m_xla.init(jax.random.PRNGKey(4), x)

    def loss(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        return (out ** 2).sum()

    g_xla = flatten_dict(jax.grad(loss)(v["params"], m_xla))
    g_mm = flatten_dict(jax.grad(loss)(v["params"], m_mm))
    for k in g_xla:
        if k[-1] == "bias" and "Conv_0" in k:
            # every ResNet9 conv feeds a BatchNorm, which subtracts the
            # batch mean — the bias gradient is mathematically zero and
            # both impls produce uncorrelated ~1e-6 float noise there
            continue
        a, b = np.asarray(g_xla[k]), np.asarray(g_mm[k])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg="/".join(k))


def test_weight_vmap_matches_member_loop(x):
    """The gang shape: vmapping the matmul-conv model over stacked weights
    equals applying it per member."""
    m = build_model("resnet9-5k", train=False, conv_impl="matmul")
    vs = [m.init(jax.random.PRNGKey(i), x) for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *p: jnp.stack(p), *vs)
    xs = jnp.stack([x, x * 0.5, x + 0.1])
    y_vmap = jax.vmap(m.apply)(stacked, xs)
    for i, v in enumerate(vs):
        np.testing.assert_allclose(
            np.asarray(y_vmap[i]), np.asarray(m.apply(v, xs[i])),
            rtol=2e-5, atol=2e-5,
        )


def test_train_model_conv_impl_smoke():
    """End-to-end: a matmul-conv run trains and matches the xla-conv run's
    loss trajectory closely (same plans, same init, same math)."""
    from pcgmix_tpu.data import synthetic_physionet_dict
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=16, num_wavs_test=6, segments_per_wav=2,
        sig_len=512, seed=1,
    )
    kw = dict(
        dataset="PhysioNet", model="resnet9-5k", method="durratiomixup",
        num_epochs=2, batch_size=8, sig_len=512, loader_parity="numpy",
        save_artifacts=False, plot=False,
    )
    p_xla = train_model(TrainConfig(**kw), ds)
    p_mm = train_model(TrainConfig(**kw, conv_impl="matmul"), ds)
    np.testing.assert_allclose(
        p_mm["train_loss"], p_xla["train_loss"], rtol=5e-2,
    )


def test_gang_conv_impl_matches_standalone():
    """A matmul-conv gang reproduces the standalone matmul-conv runs."""
    from pcgmix_tpu.data import synthetic_physionet_dict
    from pcgmix_tpu.train import TrainConfig, train_gang, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=6, segments_per_wav=2,
        sig_len=512, seed=1,
    )
    kw = dict(
        dataset="PhysioNet", model="resnet9-5k", method="durratiomixup",
        num_epochs=2, batch_size=8, sig_len=512, loader_parity="numpy",
        save_artifacts=False, plot=False, op="SGD", conv_impl="matmul",
    )
    cfgs = [TrainConfig(**kw, seed_data=sd) for sd in (1010001, 1010002)]
    gang_perfs = train_gang(cfgs, ds)
    for cfg, gp in zip(cfgs, gang_perfs):
        sp = train_model(cfg, ds)
        np.testing.assert_allclose(
            gp["train_loss"], sp["train_loss"], rtol=1e-3,
        )


def test_runner_conv_impl_flag(tmp_path):
    """--conv-impl matmul flows through the runner CLI to a finished run
    whose accuracy matches the xla-conv run of the same grid cell."""
    import glob
    import os
    import pickle

    from pcgmix_tpu import utils
    from pcgmix_tpu.data import synthetic_physionet_dict
    from pcgmix_tpu.exp import runner

    dat = str(tmp_path / "p.dat")
    utils.dict2file(
        synthetic_physionet_dict(16, 6, 2, 512, seed=1), dat
    )
    outs = {}
    for impl in ("xla", "matmul"):
        root = str(tmp_path / f"exp_{impl}")
        runner.main([
            "--dataset-file", dat, "--experiments-root", root,
            "--methods", "durratiomixup", "--n-fractions", "1.0",
            "--seeds", "1", "--model", "resnet9-5k", "--num-epochs", "2",
            "--batch-size", "8", "--sig-len", "512", "--no-robust",
            "--conv-impl", impl,
        ])
        (pkl,) = glob.glob(os.path.join(root, "*", "performance.pkl"))
        with open(pkl, "rb") as f:
            outs[impl] = pickle.load(f)
    np.testing.assert_allclose(
        outs["matmul"]["train_loss"], outs["xla"]["train_loss"], rtol=5e-2
    )
