"""Model zoo tests: shapes, split-forward consistency, parameter sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgmix_tpu.models import build_model
from pcgmix_tpu.models.registry import MODEL_NAMES

KEY = jax.random.PRNGKey(4)

SMALL_1D = [
    ("resnet9-5k", (2, 4, 320)),
    ("Potes", (2, 4, 320)),
    ("FCN", (2, 4, 320)),
    ("ResCNN", (2, 4, 320)),
    ("ResNet", (2, 4, 320)),
    ("Singstad_d3", (2, 4, 320)),
]


def _init_and_apply(model, x, **kw):
    variables = model.init(KEY, x)
    out, _ = model.apply(
        variables, x, mutable=["batch_stats"], rngs={"dropout": KEY}, **kw
    )
    return variables, out


@pytest.mark.parametrize("name,shape", SMALL_1D)
def test_forward_shapes(name, shape):
    model = build_model(name, train=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    _, out = _init_and_apply(model, x)
    assert out.shape == (shape[0], 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "name,shape,depths",
    [
        ("resnet9-5k", (2, 4, 320), [1, 2, 3]),
        ("Potes", (2, 4, 320), [1]),
        ("FCN", (2, 4, 320), [1, 2, 3, 4]),
        ("ResCNN", (2, 4, 320), [1, 2, 3, 4, 5]),
    ],
)
def test_split_forward_matches_full(name, shape, depths):
    """first(depth) → second(depth) must equal the plain forward in eval mode
    (the manifold/latent-mixup contract, models.py:532-566)."""
    model = build_model(name, train=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    variables = model.init(KEY, x)
    full = model.apply(variables, x, mutable=["batch_stats"])[0]
    for d in depths:
        mid = model.apply(variables, x, depth=d, part="first", mutable=["batch_stats"])[0]
        out = model.apply(
            variables, mid, depth=d, part="second", mutable=["batch_stats"]
        )[0]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(full), rtol=1e-4, atol=1e-5
        ), f"depth {d}"


def test_resnet9_2d_shapes():
    # shape-only (eval_shape): classifier input for 64² inputs is
    # 512*(64/2/2/2/4)² = 2048, matching models2d.py:86-87 / spec64.
    model = build_model("resnet9", dataset="PhysioNet(spec128)", train=False)
    x = jnp.zeros((2, 1, 64, 64), jnp.float32)
    shapes = jax.eval_shape(model.init, KEY, x)
    assert shapes["params"]["linear"]["Dense_0"]["kernel"].shape == (2048, 2)


def test_resnet9_classifier_width_matches_reference():
    """T=2500 → flatten width 39936 == reference linear size
    (train_model.py:337-338); UMC T=2000 → 31744 (train_model.py:339-340).
    Shape-only via eval_shape (single-core CPU: avoid real init)."""
    model = build_model("resnet9", train=False)
    for t, width in [(2500, 39936), (2000, 31744)]:
        shapes = jax.eval_shape(model.init, KEY, jnp.zeros((1, 4, t), jnp.float32))
        assert shapes["params"]["linear"]["Dense_0"]["kernel"].shape == (width, 2)


def test_unknown_model_raises():
    # tsai-zoo names now build natively (tests/test_tsai_zoo.py); only
    # genuinely unknown names raise
    with pytest.raises(ValueError):
        build_model("nope")


def test_latent_space_part():
    model = build_model("ResCNN", train=False)
    x = jnp.zeros((2, 4, 640), jnp.float32)
    variables = model.init(KEY, x)
    emb = model.apply(variables, x, part="latent_space", mutable=["batch_stats"])[0]
    assert emb.shape == (2, 128)


def test_max_pool_matches_reduce_window_contract():
    """Whatever their implementation (reduce-window today; a reshape-max
    variant measured slower on TPU, see layers.py), max_pool_1d/2d must stay
    bit-identical to torch-style reduce-window pooling incl. truncation."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pcgmix_tpu.models.layers import max_pool_1d, max_pool_2d

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(3, 101, 5)).astype(np.float32))
    for w in (2, 4):
        ref = nn.max_pool(
            x1[:, : (x1.shape[1] // w) * w], (w,), strides=(w,), padding="VALID"
        )
        np.testing.assert_array_equal(np.asarray(max_pool_1d(x1, w)), np.asarray(ref))
    x2 = jnp.asarray(rng.normal(size=(2, 33, 33, 4)).astype(np.float32))
    for w in (2, 4):
        n = (33 // w) * w
        ref = nn.max_pool(
            x2[:, :n, :n], (w, w), strides=(w, w), padding="VALID"
        )
        np.testing.assert_array_equal(np.asarray(max_pool_2d(x2, w)), np.asarray(ref))
    # gradient flows to exactly one element per window
    g = jax.grad(lambda y: max_pool_1d(y, 2).sum())(x1)
    per_window = np.asarray(g)[:, :100].reshape(3, 50, 2, 5).sum(axis=2)
    np.testing.assert_array_equal(per_window, np.ones_like(per_window))
