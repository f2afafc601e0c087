"""tsai-zoo model family tests (train_model.py:306-384 names).

tsai itself is not in this image, so there is no bit-parity oracle for the
full architectures — these tests pin (a) the whole surface builds/runs/
grads, (b) the pieces whose semantics ARE oracle-checkable in-image
(torch adaptive/avg pooling, the OmniScaleCNN generation rule, the mWDN
band-matrix init, recurrent-cell parity via weight transplant into torch),
and (c) integration through ``train_model``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgmix_tpu.models import build_model
from pcgmix_tpu.models.registry import MODEL_NAMES, max_latent_depth

KEY = jax.random.PRNGKey(4)

TSAI_NAMES = [
    "ResNetPlus", "XResNet1d18", "XResNet1d18Plus", "InceptionTime",
    "InceptionTimePlus", "XceptionTime", "XceptionTimePlus", "gMLP",
    "XCM", "XCMPlus", "FCNPlus", "RNN", "LSTM", "GRU", "mWDN",
    "OmniScaleCNN",
]


def _x(shape=(2, 4, 256), seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


@pytest.mark.parametrize("name", TSAI_NAMES)
def test_registry_and_forward(name):
    assert name in MODEL_NAMES
    model = build_model(name, train=False)
    x = _x()
    v = model.init(KEY, x)
    out = model.apply(v, x)
    lat = model.apply(v, x, part="latent_space")
    assert out.shape == (2, 2)
    assert lat.ndim == 2 and lat.shape[0] == 2 and lat.shape[1] > 2
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["InceptionTime", "XceptionTime", "XCM", "LSTM"])
def test_grad_step(name):
    """One SGD step in train mode moves the loss (BN mutable, grads finite)."""
    model = build_model(name, train=True)
    x = _x((4, 4, 128), seed=1)
    y = jnp.asarray([0, 1, 0, 1])
    v = model.init(KEY, x)
    params, rest = v["params"], {k: v[k] for k in v if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **rest}, x, mutable=["batch_stats"],
            rngs={"dropout": KEY},
        )
        onehot = jax.nn.one_hot(y, 2)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(out) * onehot, axis=-1))

    l0, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    norms = [float(jnp.linalg.norm(leaf)) for leaf in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms) and sum(norms) > 0
    p1 = jax.tree_util.tree_map(lambda p, gg: p - 0.05 * gg, params, g)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)


def test_plus_variants_share_architecture():
    """The Plus aliases produce identical param trees (tsai defaults are
    identical; only plumbing differs there)."""
    x = _x()
    for a, b in [("InceptionTime", "InceptionTimePlus"),
                 ("XceptionTime", "XceptionTimePlus"),
                 ("XResNet1d18", "XResNet1d18Plus"),
                 ("XCM", "XCMPlus")]:
        va = build_model(a, train=False).init(KEY, x)
        vb = build_model(b, train=False).init(KEY, x)
        ta = jax.tree_util.tree_map(lambda p: p.shape, va)
        tb = jax.tree_util.tree_map(lambda p: p.shape, vb)
        assert ta == tb


def test_adaptive_avg_pool_matches_torch():
    """XceptionTime's head pool uses exact torch AdaptiveAvgPool1d bin
    edges — oracle against torch (in-image) incl. a non-divisible length."""
    torch = pytest.importorskip("torch")
    from pcgmix_tpu.models.tsai_inception import adaptive_avg_pool_1d

    for t in (250, 257, 73):
        x = np.random.default_rng(t).standard_normal((3, t, 5)).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool_1d(jnp.asarray(x), 50))
        ref = torch.nn.functional.adaptive_avg_pool1d(
            torch.tensor(x).permute(0, 2, 1), 50
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_avg_pool_ceil_matches_torch():
    """XResNet's ResNet-D downsample pool == torch AvgPool1d(2, ceil_mode=
    True) with the count_include_pad=True default."""
    torch = pytest.importorskip("torch")
    from pcgmix_tpu.models.tsai_xresnet import _avg_pool_ceil

    for t in (10, 11):
        x = np.random.default_rng(t).standard_normal((2, t, 3)).astype(np.float32)
        ours = np.asarray(_avg_pool_ceil(jnp.asarray(x), 2))
        ref = torch.nn.AvgPool1d(2, ceil_mode=True)(
            torch.tensor(x).permute(0, 2, 1)
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_omniscale_generation_rule():
    """The published OS-CNN rule: kernel set {1,2}∪primes ≤ min(T/4, 89),
    layer-2 input = |primes|·out, final layer ks (1, 2)."""
    from pcgmix_tpu.models.tsai_misc import (
        _primes_incl_one, omniscale_layer_parameters,
    )

    assert _primes_incl_one(1, 12) == [1, 2, 3, 5, 7, 11]
    layers = omniscale_layer_parameters(2500, 4)
    primes = _primes_incl_one(1, 89)
    assert [ks for _, _, ks in layers[0]] == primes
    in0, out0, _ = layers[0][0]
    assert in0 == 4 and out0 == max(1, int(8 * 128 * 4 / (4 * sum(primes))))
    in1 = layers[1][0][0]
    assert in1 == len(primes) * out0
    assert [ks for _, _, ks in layers[2]] == [1, 2]
    # short series shrink the kernel range (T/4)
    assert max(ks for _, _, ks in omniscale_layer_parameters(100, 4)[0]) <= 25


def test_mwdn_band_init():
    """WaveBlock kernels carry the db4 coefficients on the band diagonals
    exactly; off-band entries are small noise (0.1·min|filter|)."""
    from pcgmix_tpu.models.tsai_misc import _MWDN_L, _mwdn_kernel_init

    p = 32
    k = np.asarray(_mwdn_kernel_init(_MWDN_L, p)(jax.random.PRNGKey(0), (p, p)))
    for d, f in enumerate(_MWDN_L):
        np.testing.assert_allclose(np.diag(k, -d), f, atol=1e-6)
    off = np.triu(k, 1)
    eps = 0.1 * min(abs(f) for f in _MWDN_L)
    assert np.abs(off).max() < 10 * eps and np.abs(off).max() > 0


def test_gru_matches_torch_transplant():
    """Recurrent parity: transplant flax GRU weights into torch.nn.GRU
    (torch's two bias vectors collapse onto flax's placement) and compare
    the full-sequence outputs."""
    torch = pytest.importorskip("torch")
    from pcgmix_tpu.models.tsai_seq import TsaiRNN

    c_in, hidden, t = 4, 8, 16
    model = TsaiRNN(num_classes=2, hidden_size=hidden, cell_type="gru", train=False)
    x = _x((2, c_in, t), seed=3)
    v = model.init(KEY, x)
    cell = v["params"]["GRUCell_0"]  # nn.RNN exposes the cell's own scope

    tg = torch.nn.GRU(c_in, hidden, batch_first=True)
    with torch.no_grad():
        # torch gate order: r, z, n.  flax names: ir/iz/in, hr/hz/hn.
        w_ih = np.concatenate(
            [np.asarray(cell[g]["kernel"]).T for g in ("ir", "iz", "in")]
        )
        w_hh = np.concatenate(
            [np.asarray(cell[g]["kernel"]).T for g in ("hr", "hz", "hn")]
        )
        b_ih = np.concatenate(
            [np.asarray(cell[g]["bias"]) for g in ("ir", "iz", "in")]
        )
        # flax puts the recurrent bias only on the n gate
        b_hh = np.concatenate(
            [np.zeros(hidden, np.float32), np.zeros(hidden, np.float32),
             np.asarray(cell["hn"]["bias"])]
        )
        tg.weight_ih_l0.copy_(torch.tensor(w_ih))
        tg.weight_hh_l0.copy_(torch.tensor(w_hh))
        tg.bias_ih_l0.copy_(torch.tensor(b_ih))
        tg.bias_hh_l0.copy_(torch.tensor(b_hh))
        ref, _ = tg(torch.tensor(np.asarray(x)).permute(0, 2, 1))

    lat = model.apply(v, x, part="latent_space")  # last step's output
    np.testing.assert_allclose(
        np.asarray(lat), ref[:, -1].numpy(), atol=1e-5
    )


def test_lstm_matches_torch_transplant():
    """LSTM parity: flax gate kernels (i/f/g/o split, input kernels
    bias-free, hidden kernels biased) mapped onto torch.nn.LSTM's
    concatenated weights; compare full-sequence last-step outputs."""
    torch = pytest.importorskip("torch")
    from pcgmix_tpu.models.tsai_seq import TsaiRNN

    c_in, hidden, t = 4, 8, 16
    model = TsaiRNN(num_classes=2, hidden_size=hidden, cell_type="lstm", train=False)
    x = _x((2, c_in, t), seed=5)
    v = model.init(KEY, x)
    cell = v["params"]["OptimizedLSTMCell_0"]

    tl = torch.nn.LSTM(c_in, hidden, batch_first=True)
    with torch.no_grad():
        gates = ("i", "f", "g", "o")  # torch gate order
        tl.weight_ih_l0.copy_(torch.tensor(np.concatenate(
            [np.asarray(cell[f"i{g}"]["kernel"]).T for g in gates])))
        tl.weight_hh_l0.copy_(torch.tensor(np.concatenate(
            [np.asarray(cell[f"h{g}"]["kernel"]).T for g in gates])))
        tl.bias_ih_l0.zero_()
        tl.bias_hh_l0.copy_(torch.tensor(np.concatenate(
            [np.asarray(cell[f"h{g}"]["bias"]) for g in gates])))
        ref, _ = tl(torch.tensor(np.asarray(x)).permute(0, 2, 1))

    lat = model.apply(v, x, part="latent_space")
    np.testing.assert_allclose(np.asarray(lat), ref[:, -1].numpy(), atol=1e-5)


def test_rnn_matches_torch_transplant():
    """Vanilla tanh RNN parity against torch.nn.RNN."""
    torch = pytest.importorskip("torch")
    from pcgmix_tpu.models.tsai_seq import TsaiRNN

    c_in, hidden, t = 4, 8, 16
    model = TsaiRNN(num_classes=2, hidden_size=hidden, cell_type="rnn", train=False)
    x = _x((2, c_in, t), seed=7)
    v = model.init(KEY, x)
    cell = v["params"]["SimpleCell_0"]

    tr = torch.nn.RNN(c_in, hidden, batch_first=True)
    with torch.no_grad():
        tr.weight_ih_l0.copy_(torch.tensor(np.asarray(cell["i"]["kernel"]).T))
        tr.weight_hh_l0.copy_(torch.tensor(np.asarray(cell["h"]["kernel"]).T))
        tr.bias_ih_l0.copy_(torch.tensor(np.asarray(cell["i"]["bias"])))
        tr.bias_hh_l0.zero_()
        ref, _ = tr(torch.tensor(np.asarray(x)).permute(0, 2, 1))

    lat = model.apply(v, x, part="latent_space")
    np.testing.assert_allclose(np.asarray(lat), ref[:, -1].numpy(), atol=1e-5)


@pytest.mark.parametrize("name", TSAI_NAMES)
def test_no_split_forward(name):
    """latentmixup's depth draw must raise for tsai names — the reference
    crashes for them too (no pass_parts)."""
    with pytest.raises(NotImplementedError):
        max_latent_depth(name)


def test_train_model_integration():
    """Two representative zoo models through the full training loop."""
    from pcgmix_tpu.data import synthetic_physionet_dict
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(12, 4, 2, 128, seed=1)
    for model in ("InceptionTime", "GRU"):
        perf = train_model(
            TrainConfig(model=model, method="base", num_epochs=1,
                        batch_size=8, sig_len=128, save_artifacts=False,
                        loader_parity="numpy"),
            ds,
        )
        assert np.isfinite(perf["train_loss"][-1])


@pytest.mark.parametrize(
    "name", ["InceptionTime", "XceptionTime", "XResNet1d18", "gMLP", "XCM",
             "mWDN", "OmniScaleCNN"],
)
def test_bf16_compute_mode(name):
    """The TPU fast path: bf16 compute, fp32 params, fp32 logits, finite."""
    import jax.numpy as jnp

    model = build_model(name, train=False, compute_dtype=jnp.bfloat16)
    x = _x((2, 4, 128), seed=9)
    v = model.init(KEY, x)
    out = model.apply(v, x)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    for leaf in jax.tree_util.tree_leaves(v["params"]):
        assert leaf.dtype == jnp.float32
