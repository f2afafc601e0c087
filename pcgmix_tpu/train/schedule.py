"""OneCycle learning-rate (and Adam β₁) schedules with torch parity.

The reference trains with ``torch.optim.lr_scheduler.OneCycleLR(optimizer,
max_lr, total_steps)`` (train_model.py:409-410) at defaults: pct_start=0.3,
anneal_strategy='cos', div_factor=25, final_div_factor=1e4, and — because
cycle_momentum defaults to True and the optimizer is Adam — β₁ is cycled
between max_momentum=0.95 and base_momentum=0.85 in counter-phase with the
learning rate.  Both schedules are cosine interpolations:

  phase 1 (steps 0 .. p·(S-1)):      start → peak
  phase 2 (steps p·(S-1) .. S-1):    peak  → end

where torch's step index is the number of completed scheduler.step() calls.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cos_anneal(start, end, pct):
    return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)


def _onecycle(step, total_steps, start, peak, end, pct_start):
    step = jnp.asarray(step, jnp.float32)
    boundary = float(pct_start * total_steps) - 1.0
    up_pct = jnp.clip(step / jnp.maximum(boundary, 1e-8), 0.0, 1.0)
    down_pct = jnp.clip(
        (step - boundary) / jnp.maximum(total_steps - 1.0 - boundary, 1e-8), 0.0, 1.0
    )
    up = _cos_anneal(start, peak, up_pct)
    down = _cos_anneal(peak, end, down_pct)
    return jnp.where(step <= boundary, up, down)


def onecycle_lr(
    total_steps: int,
    max_lr: float,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """torch-parity OneCycleLR schedule: returns f(step)->lr.

    initial = max/div_factor; final = initial/final_div_factor
    (torch defaults, matching train_model.py:409-410's call)."""
    initial = max_lr / div_factor
    final = initial / final_div_factor

    def schedule(step):
        return _onecycle(step, total_steps, initial, max_lr, final, pct_start)

    return schedule


def onecycle_beta1(
    total_steps: int,
    max_momentum: float = 0.95,
    base_momentum: float = 0.85,
    pct_start: float = 0.3,
):
    """torch-parity cycled momentum (Adam β₁): max → base → max."""

    def schedule(step):
        return _onecycle(
            step, total_steps, max_momentum, base_momentum, max_momentum, pct_start
        )

    return schedule
