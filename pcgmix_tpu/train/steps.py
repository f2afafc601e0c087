"""Jitted train/eval steps.

One train step fuses: (optional) on-device augmentation apply → forward →
soft-target CE / SELC → gradient value-clipping → OneCycle Adam/SGD update →
SELC table scatter.  This replaces the reference's per-batch sequence of
host-driven stages (train_model.py:498-582) with a single XLA program; the
only per-step host work is the O(batch) plan and the metric pulls.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pcgmix_tpu.train.losses import selc_update
from pcgmix_tpu.train.schedule import onecycle_beta1, onecycle_lr


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    soft_labels: jax.Array  # (N_train, C) SELC table
    step: jax.Array  # int32 global step counter


def make_optimizer(
    op: str,
    lr_max: float,
    weight_decay: float,
    grad_clip: float,
    num_steps: int,
    use_sched: bool,
) -> optax.GradientTransformation:
    """torch-parity optimizer chain (train_model.py:404-412).

    clip_grad_value_ runs before the optimizer (train_model.py:557-558) →
    clip first; torch Adam/SGD add weight decay to the gradient → decayed
    weights before the moment update; OneCycleLR also cycles Adam's β₁
    (cycle_momentum default) → β₁ schedule via inject_hyperparams.
    """
    parts = []
    if grad_clip:
        parts.append(optax.clip(grad_clip))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    lr = onecycle_lr(num_steps, lr_max) if use_sched else lr_max
    if op == "adam":
        if use_sched:
            parts.append(
                optax.inject_hyperparams(optax.scale_by_adam)(
                    b1=onecycle_beta1(num_steps)
                )
            )
        else:
            parts.append(optax.scale_by_adam())
    elif op == "SGD":
        if use_sched:
            # torch constructs SGD with momentum=0 (train_model.py:405) but
            # OneCycleLR (cycle_momentum default) overwrites the param-group
            # momentum every step, cycling 0.95→0.85→0.95 inverse to lr —
            # so scheduled SGD runs WITH cycled heavy-ball momentum
            parts.append(
                optax.inject_hyperparams(optax.trace)(
                    decay=onecycle_beta1(num_steps)
                )
            )
        # unscheduled SGD: update is just the (decayed, clipped) gradient
    else:
        raise ValueError(f"unknown optimizer {op!r} (use 'adam' or 'SGD')")
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def make_runtime_optimizer(
    op: str,
    lr_max: float,
    weight_decay: float,
    grad_clip: float,
) -> tuple:
    """The :func:`make_optimizer` chain with the SCHEDULE VALUES as runtime
    inputs instead of count-baked closures.

    A ragged gang (train/gang.py) trains members whose OneCycle schedules
    span different total step counts in ONE vmapped program — a baked
    ``onecycle_lr(num_steps, …)`` closure cannot vary per member, but an
    ``optax.inject_hyperparams`` state can: the per-step lr/momentum land in
    ``opt_state.…hyperparams`` (ordinary pytree leaves, so vmap carries one
    value per member).  Returns ``(tx, with_schedule)`` where
    ``with_schedule(opt_state, lr, mom)`` injects the values for one update;
    ``mom`` is Adam's β₁ (``op='adam'``) or the heavy-ball decay
    (``op='SGD'`` — pass 0.0 for torch's unscheduled momentum=0,
    train_model.py:405).  Passing each member's own table values indexed by
    its own update count reproduces the baked chain's trajectory exactly.
    """
    parts = []
    if grad_clip:
        parts.append(optax.clip(grad_clip))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if op == "adam":
        mom_key = "b1"
        parts.append(optax.inject_hyperparams(optax.scale_by_adam)(b1=0.9))
    elif op == "SGD":
        # trace(decay=0) reduces to the raw gradient, so one chain shape
        # serves both scheduled (cycled 0.95→0.85) and unscheduled SGD
        mom_key = "decay"
        parts.append(optax.inject_hyperparams(optax.trace)(decay=0.0))
    else:
        raise ValueError(f"unknown optimizer {op!r} (use 'adam' or 'SGD')")
    mom_index = len(parts) - 1
    lr_index = len(parts)
    parts.append(
        optax.inject_hyperparams(optax.scale_by_learning_rate)(
            learning_rate=lr_max
        )
    )
    tx = optax.chain(*parts)

    def with_schedule(opt_state, lr, mom):
        st = list(opt_state)
        s_m = st[mom_index]
        st[mom_index] = s_m._replace(
            hyperparams={**s_m.hyperparams, mom_key: jnp.asarray(mom, jnp.float32)}
        )
        s_l = st[lr_index]
        st[lr_index] = s_l._replace(
            hyperparams={
                **s_l.hyperparams, "learning_rate": jnp.asarray(lr, jnp.float32)
            }
        )
        return tuple(st)

    return tx, with_schedule


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    selc_es: int,
    engine=None,
    latent_depth: Optional[int] = None,
    manifold: bool = False,
    model_eval=None,
    donate: bool = True,
    model_channels: Optional[int] = None,
    train_data: Optional[jax.Array] = None,
    train_labels: Optional[jax.Array] = None,
) -> Callable:
    """Build a jitted train step.

    engine=None → plain step.  With an engine: input-space methods apply the
    plan to the batch before the forward; latent_depth selects the
    latentmixup/manifold split-forward variant (one compilation per depth,
    like the reference's per-depth code paths, augmentations.py:1494,
    :1527-1531).  ``manifold`` runs the first pass in eval mode without
    gradients (augmentations.py:1525-1534); latentmixup keeps the first pass
    differentiable and in train mode (augmentations.py:1495).

    With ``train_data``/``train_labels`` the whole corpus stays device
    resident (it is tens of MB against 16 GB of HBM) and batches are
    gathered on device from ``batch['indices']`` — the per-step host→device
    traffic collapses to the few-KB plan.
    """

    def loss_fn(params, batch_stats, soft_labels, batch, plan, epoch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if train_data is not None:
            # gather rows: batch['rows'] (gang mode — row ids into a SHARED
            # base array, distinct from the split-local 'indices' the SELC
            # table scatters by) falls back to 'indices' for single runs,
            # where the resident array IS the split
            rows = batch.get("rows")
            rows = (
                jnp.asarray(batch["indices"], jnp.int32)
                if rows is None else jnp.asarray(rows, jnp.int32)
            )
            data = jnp.take(train_data, rows, axis=0)
            num_classes = soft_labels.shape[1]
            target = jax.nn.one_hot(
                jnp.take(train_labels, rows), num_classes, dtype=train_data.dtype
            )
        else:
            data = batch["data"]
            target = batch["target_ohe"]
        rngs = {"dropout": rng}
        if engine is not None and latent_depth is None:
            data, target = engine.apply(data, target, plan)
        if model_channels is not None and data.shape[1] > model_channels:
            # classical_space mode: augmentation sees the 5-channel batch, the
            # model only the first 4 (train_model.py:532)
            data = data[:, :model_channels]
        if latent_depth is not None:
            if manifold:
                latent = model_eval.apply(
                    variables, data, depth=latent_depth, part="first"
                )
                latent = jax.lax.stop_gradient(latent)
                bs1 = batch_stats
            else:
                latent, mut = model.apply(
                    variables,
                    data,
                    depth=latent_depth,
                    part="first",
                    mutable=["batch_stats"],
                    rngs=rngs,
                )
                bs1 = mut["batch_stats"]
            latent, target = engine.apply(latent, target, plan)
            out, mut2 = model.apply(
                {"params": params, "batch_stats": bs1},
                latent,
                depth=latent_depth,
                part="second",
                mutable=["batch_stats"],
                rngs=rngs,
            )
            new_bs = mut2["batch_stats"]
        else:
            out, mut = model.apply(
                variables, data, mutable=["batch_stats"], rngs=rngs
            )
            new_bs = mut["batch_stats"]
        loss, new_soft = selc_update(
            soft_labels, out, target, batch["indices"], epoch, selc_es
        )
        preds = jnp.argmax(out, axis=1)
        tlabels = jnp.argmax(target, axis=1)
        return loss, (new_bs, new_soft, preds, tlabels)

    def step(state: TrainState, batch: dict, plan, epoch, rng):
        (loss, (new_bs, new_soft, preds, tlabels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, state.soft_labels, batch, plan, epoch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            soft_labels=new_soft,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "preds": preds, "target": tlabels}

    step._loss_fn = loss_fn  # reused by make_multi_step
    donate_argnums = (0,) if donate else ()
    jitted = jax.jit(step, donate_argnums=donate_argnums)
    jitted._raw_step = step
    return jitted


def make_multi_step(single_step: Callable, donate: bool = True) -> Callable:
    """Fuse K train steps into ONE dispatch via lax.scan.

    ``single_step`` is a step built by :func:`make_train_step` (the unjitted
    body is reused).  The caller passes per-step inputs stacked on a leading
    K axis: ``indices_seq`` (K, B), ``plan_seq`` (pytree of (K, ...) arrays —
    probability-gated-off steps encoded as identity plans, see
    AugmentEngine.identity_arrays), and ``step_ids`` (K,) for RNG folding.
    Host↔device round-trips amortize over K steps; per-step outputs come
    back stacked.
    """
    body_step = single_step._raw_step

    def multi(state: TrainState, indices_seq, plan_seq, step_ids, epoch, rng):
        def body(st, xs):
            idx, plan, sid = xs
            st, out = body_step(
                st, {"indices": idx}, plan, epoch, jax.random.fold_in(rng, sid)
            )
            return st, out

        return jax.lax.scan(body, state, (indices_seq, plan_seq, step_ids))

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi, donate_argnums=donate_argnums)


def make_eval_step(model_eval) -> Callable:
    """Jitted eval step: softmax probabilities + per-sample CE
    (test_data_accuracy, train_model.py:600-620)."""

    def step(params, batch_stats, data, target_ohe):
        out = model_eval.apply({"params": params, "batch_stats": batch_stats}, data)
        probs = jax.nn.softmax(out, axis=1)
        logp = jax.nn.log_softmax(out, axis=1)
        losses = -jnp.sum(logp * target_ohe, axis=1)
        return probs, losses

    return jax.jit(step)


def make_forward_loss(model_eval) -> Callable:
    """Per-sample losses of a candidate pool (lc-nointrusion scoring,
    augmentations.py:1264-1266 via custom_loss)."""

    def fwd(params, batch_stats, data, target_ohe):
        out = model_eval.apply({"params": params, "batch_stats": batch_stats}, data)
        logp = jax.nn.log_softmax(out, axis=1)
        return -jnp.sum(logp * target_ohe, axis=1)

    return jax.jit(fwd)
