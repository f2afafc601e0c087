"""Weight-transplant training-dynamics crosscheck (VERDICT r1 missing #4):
identical torch weights transplanted into flax, then N optimizer steps on
IDENTICAL batches in both frameworks — per-step losses must track within fp
tolerance for 'base' and 'durratiomixup'.  Exercises init-transplant, CE on
soft targets, Adam + OneCycle (lr AND cycled β₁), value clipping, weight
decay, and BatchNorm train-mode statistics end to end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
from pcgmix_tpu.data import EpochIterator, physionet_split, synthetic_physionet_dict
from pcgmix_tpu.models import build_model
from pcgmix_tpu.train.convert import torch_state_dict_to_flax
from pcgmix_tpu.train.losses import init_selc_table
from pcgmix_tpu.train.steps import TrainState, make_optimizer, make_train_step

B, C, T, STEPS = 16, 4, 512, 20
FILTERS = [2, 4, 8, 16]


def _torch_resnet9():
    """The reference ResNet9 topology with the reference's module naming
    (models.py:520-544) so state_dict keys convert directly."""

    def block(ci, co, pool=False):
        layers = [tnn.Conv1d(ci, co, 3, padding=1), tnn.BatchNorm1d(co),
                  tnn.ReLU()]
        if pool:
            layers.append(tnn.MaxPool1d(2))
        return tnn.Sequential(*layers)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            f = FILTERS
            self.conv1 = block(C, f[0])
            self.conv2 = block(f[0], f[1], pool=True)
            self.res1 = tnn.Sequential(block(f[1], f[1]), block(f[1], f[1]))
            self.conv3 = block(f[1], f[2], pool=True)
            self.conv4 = block(f[2], f[3], pool=True)
            self.res2 = tnn.Sequential(block(f[3], f[3]), block(f[3], f[3]))
            self.pool1d = tnn.MaxPool1d(4)
            self.flat = tnn.Flatten()
            self.linear = tnn.Linear(f[3] * (T // 32), 2)

        def forward(self, x):
            x = self.conv1(x)
            x = self.conv2(x)
            x = self.res1(x) + x
            x = self.conv3(x)
            x = self.conv4(x)
            x = self.res2(x) + x
            return self.linear(self.flat(self.pool1d(x)))

    return Net()


def _prebuild_batches(method):
    """Identical (augmented) arrays for both frameworks: host plans + device
    apply pulled back to numpy."""
    ds = synthetic_physionet_dict(
        num_wavs_train=24, num_wavs_test=2, segments_per_wav=2, sig_len=T,
        seed=9,
    )
    train = physionet_split(ds, "train", train_balance=False)
    eng = AugmentEngine(
        AugmentConfig(method, B, C, T, model="resnet9-5k")
    ) if method != "base" else None
    out = []
    step = 0
    while len(out) < STEPS:
        for b in EpochIterator(train, B, 1, step, "numpy"):
            x = b["data"].astype(np.float32)
            t = np.eye(2, dtype=np.float32)[b["label"]]
            if eng is not None:
                plan = eng.plan(step, b["frames"], b["label"], b["wav"])
                if plan is not None:
                    xd, td = eng.apply(jnp.asarray(x), jnp.asarray(t), plan.arrays)
                    x, t = np.asarray(xd), np.asarray(td)
            out.append((x, t, b["indices"]))
            step += 1
            if len(out) >= STEPS:
                break
    return out


def _run_torch(net, batches):
    opt = torch.optim.Adam(net.parameters(), lr=0.01, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=0.01, total_steps=STEPS
    )
    losses = []
    net.train()
    for x, t, _ in batches:
        out = net(torch.from_numpy(x))
        logp = torch.nn.functional.log_softmax(out, dim=1)
        loss = (-(logp * torch.from_numpy(t)).sum(dim=1)).mean()
        loss.backward()
        tnn.utils.clip_grad_value_(net.parameters(), 0.1)
        opt.step()
        opt.zero_grad()
        sched.step()
        losses.append(float(loss))
    return np.array(losses)


def _run_flax(variables, batches):
    model = build_model("resnet9-5k", train=True)
    tx = make_optimizer("adam", 0.01, 1e-4, 0.1, STEPS, True)
    n_train = 64
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        soft_labels=init_selc_table(np.zeros(n_train, np.int64), 2),
        step=jnp.asarray(0, jnp.int32),
    )
    step = make_train_step(model, tx, selc_es=999, donate=False)
    losses = []
    for x, t, idx in batches:
        batch = {
            "data": jnp.asarray(x),
            "target_ohe": jnp.asarray(t),
            "indices": jnp.asarray(idx % n_train),
        }
        state, out = step(state, batch, None, 1, jax.random.PRNGKey(0))
        losses.append(float(out["loss"]))
    return np.array(losses)


@pytest.mark.parametrize("method", ["base", "durratiomixup"])
def test_transplanted_training_losses_track_torch(method):
    torch.manual_seed(4)
    torch.set_num_threads(1)
    net = _torch_resnet9()
    variables = torch_state_dict_to_flax(net.state_dict(), "resnet9-5k")
    batches = _prebuild_batches(method)

    losses_t = _run_torch(net, batches)
    losses_j = _run_flax(variables, batches)

    delta = np.abs(losses_j - losses_t)
    rel = delta / np.maximum(np.abs(losses_t), 1e-6)
    # identical weights/data/schedule: early steps agree to fp noise; later,
    # fp-noise amplification through the nonlinear trajectory is inherent
    # (two torch runs with different threading diverge the same way), so the
    # late criterion is absolute
    assert delta[0] < 1e-5, f"step-0 loss differs: {losses_t[0]} vs {losses_j[0]}"
    assert rel[:7].max() < 1e-3, (
        f"{method}: early per-step losses diverged, max rel {rel[:7].max():.2e}\n"
        f"torch: {losses_t}\nflax:  {losses_j}"
    )
    assert delta.max() < 5e-2, (
        f"{method}: trajectories separated, max |Δloss| {delta.max():.3f}\n"
        f"torch: {losses_t}\nflax:  {losses_j}"
    )


def test_torch_seeded_init_matches_fresh_reference_init():
    """VERDICT r2 stretch #9: torch_seeded_init draws the reference's exact
    fresh-run weights (construction order conv1..res2, linear under
    manual_seed(4)) — tree-equal to converting a freshly seeded replica."""
    from pcgmix_tpu.train.convert import torch_seeded_init

    torch.manual_seed(4)
    net = _torch_resnet9()
    expect = torch_state_dict_to_flax(net.state_dict(), "resnet9-5k")
    got = torch_seeded_init("resnet9-5k", num_channels=C, sig_len=T)
    flat_e = jax.tree_util.tree_leaves_with_path(expect)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    assert len(flat_e) == len(flat_g)
    for (pe, le), (pg, lg) in zip(flat_e, flat_g):
        assert pe == pg
        np.testing.assert_array_equal(le, lg, err_msg=str(pe))


def test_fresh_run_bit_parity_step0():
    """A FRESH flax run under TrainConfig.torch_init reproduces the torch
    replica's step-0 loss to fp tolerance (the '+torch-RNG init shim' Done
    criterion) — no checkpoint transplanted anywhere."""
    from pcgmix_tpu.train.convert import torch_seeded_init

    batches = _prebuild_batches("base")
    torch.manual_seed(4)
    net = _torch_resnet9()
    losses_t = _run_torch(net, batches)
    variables = torch_seeded_init("resnet9-5k", num_channels=C, sig_len=T)
    losses_j = _run_flax(variables, batches)
    assert abs(losses_j[0] - losses_t[0]) < 1e-5


def test_train_model_torch_init_smoke():
    """TrainConfig(torch_init=True) trains end-to-end."""
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_physionet_dict(
        num_wavs_train=12, num_wavs_test=4, segments_per_wav=2, sig_len=T,
        seed=3,
    )
    perf = train_model(
        TrainConfig(
            model="resnet9-5k", method="base", num_epochs=2, batch_size=8,
            sig_len=T, save_artifacts=False, loader_parity="numpy",
            torch_init=True,
        ),
        ds,
    )
    assert np.isfinite(perf["train_loss"]).all()


def test_torch_init_rejects_2d():
    """torch_init covers only the 1-D ResNet9 init tensors; a 2-D
    (spectrogram) config must fail loudly with the transplant pointer, not
    silently fall back to flax init."""
    import pytest

    from pcgmix_tpu.data.synthetic import synthetic_spectrogram_dict
    from pcgmix_tpu.train import TrainConfig, train_model

    ds = synthetic_spectrogram_dict(num_wavs_train=8, num_wavs_test=4, size=32)
    cfg = TrainConfig(
        dataset="PhysioNet(spec128)", model="resnet9", method="base",
        num_epochs=1, batch_size=8, save_artifacts=False,
        loader_parity="numpy", torch_init=True,
    )
    with pytest.raises(NotImplementedError, match="load_torch_checkpoint"):
        train_model(cfg, ds)
