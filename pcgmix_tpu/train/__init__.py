"""Training/eval runtime (SURVEY.md §2 component 1).

The reference's epoch loop (train_model.py:197-589) becomes: a host loop
that builds per-step augmentation plans and calls ONE jitted train step
(augment → forward → soft-target CE/SELC → value-clip → OneCycle Adam/SGD),
plus a jitted eval step with host-side recording-level aggregation.
"""

from pcgmix_tpu.train.losses import soft_target_ce, selc_update
from pcgmix_tpu.train.schedule import onecycle_lr, onecycle_beta1
from pcgmix_tpu.train.loop import TrainConfig, train_model
from pcgmix_tpu.train.gang import train_gang, gang_ineligible_reason, group_gangable

__all__ = [
    "soft_target_ce",
    "selc_update",
    "onecycle_lr",
    "onecycle_beta1",
    "TrainConfig",
    "train_model",
    "train_gang",
    "gang_ineligible_reason",
    "group_gangable",
]
