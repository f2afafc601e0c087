"""Schedule parity vs torch; loss behaviors."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcgmix_tpu.train.losses import init_selc_table, selc_update, soft_target_ce
from pcgmix_tpu.train.schedule import onecycle_beta1, onecycle_lr


def test_onecycle_lr_matches_torch():
    torch = pytest.importorskip("torch")
    total, max_lr = 200, 0.01
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=max_lr, total_steps=total)
    ours = onecycle_lr(total, max_lr)
    theirs, mine = [], []
    for step in range(total):
        theirs.append(opt.param_groups[0]["lr"])
        mine.append(float(ours(step)))
        opt.step()
        sched.step()
    np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-9)


def test_onecycle_beta1_matches_torch():
    torch = pytest.importorskip("torch")
    total, max_lr = 150, 0.01
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=max_lr, total_steps=total)
    ours = onecycle_beta1(total)
    theirs, mine = [], []
    for step in range(total):
        theirs.append(opt.param_groups[0]["betas"][0])
        mine.append(float(ours(step)))
        opt.step()
        sched.step()
    np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-7)


def test_soft_target_ce_matches_torch_ce():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 16)
    ohe = np.eye(2, dtype=np.float32)[labels]
    ours = float(soft_target_ce(jnp.asarray(logits), jnp.asarray(ohe)))
    theirs = float(
        torch.nn.functional.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    )
    assert abs(ours - theirs) < 1e-6


def test_selc_before_and_after_turnpoint():
    rng = np.random.default_rng(0)
    n, c = 10, 2
    labels = rng.integers(0, c, n)
    table = init_selc_table(labels, c)
    logits = jnp.asarray(rng.normal(size=(4, c)).astype(np.float32))
    ohe = jnp.asarray(np.eye(c, dtype=np.float32)[labels[:4]])
    idx = jnp.arange(4)

    loss_before, table_before = selc_update(table, logits, ohe, idx, epoch=3, es=5)
    np.testing.assert_allclose(np.asarray(table_before), np.asarray(table))
    assert abs(float(loss_before) - float(soft_target_ce(logits, ohe))) < 1e-6

    loss_after, table_after = selc_update(table, logits, ohe, idx, epoch=6, es=5)
    pred = np.asarray(jnp.take(jax_softmax(logits), idx, axis=0))
    expected_rows = 0.9 * np.asarray(table)[:4] + 0.1 * pred
    np.testing.assert_allclose(
        np.asarray(table_after)[:4], expected_rows, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(table_after)[4:], np.asarray(table)[4:], rtol=1e-6
    )
    exp_loss = -np.mean(
        np.sum(np.log(np.asarray(jax_softmax(logits))) * expected_rows, axis=1)
    )
    assert abs(float(loss_after) - exp_loss) < 1e-5


def jax_softmax(x):
    import jax

    return jax.nn.softmax(x, axis=1)


def test_sgd_onecycle_cycles_momentum_like_torch():
    """torch builds SGD with momentum=0 but OneCycleLR overwrites the
    param-group momentum every step (cycle_momentum default), so scheduled
    SGD trains WITH cycled heavy-ball momentum — our optax chain must
    reproduce the full update sequence (regression: momentum was absent)."""
    import torch

    import jax.numpy as jnp
    from pcgmix_tpu.train.steps import make_optimizer

    num_steps = 12
    lr_max, wd = 0.01, 1e-4
    g_np = np.linspace(0.5, -0.5, num_steps).astype(np.float32)

    # torch side: exactly the reference construction (train_model.py:405,:410)
    w_t = torch.nn.Parameter(torch.tensor([1.0]))
    opt = torch.optim.SGD([w_t], lr=lr_max, weight_decay=wd)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr_max, total_steps=num_steps
    )
    torch_traj = []
    for g in g_np:
        opt.zero_grad()
        w_t.grad = torch.tensor([float(g)])
        # torch applies weight decay inside the step; grad clip value 0.1
        torch.nn.utils.clip_grad_value_([w_t], 0.1)
        opt.step()
        sched.step()
        torch_traj.append(float(w_t.detach()))

    tx = make_optimizer("SGD", lr_max, wd, 0.1, num_steps, use_sched=True)
    params = {"w": jnp.asarray([1.0])}
    state = tx.init(params)
    ours_traj = []
    import optax

    for g in g_np:
        updates, state = tx.update({"w": jnp.asarray([g])}, state, params)
        params = optax.apply_updates(params, updates)
        ours_traj.append(float(params["w"][0]))

    np.testing.assert_allclose(ours_traj, torch_traj, rtol=1e-5, atol=1e-7)
