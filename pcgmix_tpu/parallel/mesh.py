"""Mesh construction and data-parallel step wrapping.

Design: GSPMD does the heavy lifting.  We annotate inputs — train state
replicated, batch + per-sample plan arrays sharded on the leading (batch)
axis — and jit the SAME step function used single-chip.  XLA inserts the
gradient all-reduce and turns the mixing gathers (``data[mix_indices]``,
partner rows may live on other shards) into ICI collectives automatically.
The SELC soft-label table stays replicated; its per-batch scatter uses
globally unique sample indices, so every replica writes identical values.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (axis,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data",
                axis_index: int = 0) -> Any:
    """Shard every array leaf on its batch axis (``axis_index``); leaves too
    small/short to shard evenly — scalars, PRNG keys, per-step vectors — are
    replicated.  axis_index=1 covers scan-stacked (K, B, ...) plan trees."""

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if (getattr(x, "ndim", 0) >= axis_index + 1
                and x.shape[axis_index] % mesh.devices.size == 0):
            spec = [None] * axis_index + [axis]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def make_dp_train_step(step_fn, mesh: Mesh, axis: str = "data"):
    """Wrap a train step for data parallelism.

    step_fn(state, batch, plan, epoch, rng) is the single-chip step from
    pcgmix_tpu.train.steps (already jitted — jit composes).  The caller is
    responsible for placing state via :func:`replicate` and batches via
    :func:`shard_batch`; GSPMD propagates shardings through the step, so
    this wrapper only constrains the outputs back to the expected layout.
    """

    def dp_step(state, batch, plan, epoch, rng):
        new_state, out = step_fn(state, batch, plan, epoch, rng)
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(axis))
        new_state = jax.lax.with_sharding_constraint(new_state, rep)
        out = {
            "loss": jax.lax.with_sharding_constraint(out["loss"], rep),
            "preds": jax.lax.with_sharding_constraint(out["preds"], shard),
            "target": jax.lax.with_sharding_constraint(out["target"], shard),
        }
        return new_state, out

    return jax.jit(dp_step)
