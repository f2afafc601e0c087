"""Losses: soft-target cross-entropy and SELC (self-ensemble label correction).

Parity targets: CELoss (train_model.py:45-54), SELCLoss (train_model.py:56-80),
custom_loss (train_model.py:82-103).

The reference keeps the SELC soft-label table as a CUDA-resident buffer
mutated in the forward (train_model.py:60, :77); here the table is part of
the functional train state and its momentum update happens inside the jitted
step.  Under data parallelism the table is replicated and the per-batch
scatter is deterministic because global sample indices within a batch are
unique.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_target_ce(logits: jax.Array, target_ohe: jax.Array) -> jax.Array:
    """Mean cross-entropy against (possibly soft) one-hot targets
    (train_model.py:51-54).  Computed in float32 regardless of the model's
    compute dtype."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    return -jnp.mean(jnp.sum(logp * target_ohe, axis=1))


def selc_update(
    soft_labels: jax.Array,
    logits: jax.Array,
    target_ohe: jax.Array,
    indices: jax.Array,
    epoch: jax.Array,
    es: int,
    momentum: float = 0.9,
) -> tuple[jax.Array, jax.Array]:
    """SELC loss + soft-label table update (train_model.py:66-80).

    Before epoch `es` (inclusive) the loss is plain CE on the given targets
    and the table is untouched; after, the table rows of this batch are
    EMA-updated with the detached predictions and the loss is CE against the
    *updated* rows.  `epoch` may be a traced scalar; both branches are cheap
    so we compute them and select.

    Returns (loss, new_soft_labels).
    """
    indices = indices.astype(jnp.int32)
    logits = logits.astype(jnp.float32)
    target_ohe = target_ohe.astype(jnp.float32)
    pred_detach = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=1)
    rows = jnp.take(soft_labels, indices, axis=0)
    new_rows = momentum * rows + (1.0 - momentum) * pred_detach
    use_selc = jnp.asarray(epoch) > es

    logp = jax.nn.log_softmax(logits, axis=1)
    ce = -jnp.mean(jnp.sum(logp * target_ohe, axis=1))
    selc = -jnp.mean(jnp.sum(logp * new_rows, axis=1))
    loss = jnp.where(use_selc, selc, ce)

    written = jnp.where(use_selc, new_rows, rows)
    new_table = soft_labels.at[indices].set(written)
    return loss, new_table


def init_selc_table(labels, num_classes: int) -> jax.Array:
    """One-hot initialization of the soft-label table (train_model.py:60-61)."""
    return jax.nn.one_hot(jnp.asarray(labels), num_classes, dtype=jnp.float32)
