"""torch-checkpoint → flax converter (migration/crosscheck tool).

Converts a reference ``model.pth`` state_dict (train_model.py:481-482) into
the {'params', 'batch_stats'} trees this framework's models consume, so a
reference-trained checkpoint can be loaded and forward-compared exactly —
the cheapest insurance for the ≤0.5 pt accuracy-parity target (BASELINE.md).

Covered: ResNet9 width presets (models.py:520-589) and the Potes CNN
(models.py:367-465).  Layout notes:
- torch Conv1d weight (Co, Ci, k)  → flax Conv kernel (k, Ci, Co)
- torch Linear weight (Co, Ci)    → flax Dense kernel (Ci, Co)
- torch BatchNorm1d weight/bias   → flax BatchNorm scale/bias;
  running_mean/var → batch_stats mean/var
The flatten order is already torch-parity in the models (flatten_torch), so
Linear weights map without permutation.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    # copy: .numpy() returns a VIEW of torch storage — without it, in-place
    # optimizer updates on the torch side would mutate the converted tree
    return np.array(v, np.float32, copy=True)


def _conv(sd: Mapping, prefix: str) -> dict:
    return {
        "Conv_0": {
            "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    }


def _bn_params(sd: Mapping, prefix: str) -> dict:
    return {
        "BatchNorm_0": {
            "scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    }


def _bn_stats(sd: Mapping, prefix: str) -> dict:
    return {
        "BatchNorm_0": {
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"]),
        }
    }


def _dense(sd: Mapping, prefix: str) -> dict:
    return {
        "Dense_0": {
            "kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    }


# torch module path → flax block name (ResNet9_myrtle, models.py:520-531)
_RESNET9_BLOCKS = {
    "conv1": "conv1",
    "conv2": "conv2",
    "res1.0": "res1a",
    "res1.1": "res1b",
    "conv3": "conv3",
    "conv4": "conv4",
    "res2.0": "res2a",
    "res2.1": "res2b",
}


def torch_resnet9_to_flax(state_dict: Mapping[str, Any]) -> dict:
    """ResNet9 state_dict → {'params', 'batch_stats'}.

    Each reference conv_block is Sequential(Conv1d, BatchNorm1d, ReLU[, Pool])
    (models.py:467-472), so '<block>.0' is the conv and '<block>.1' the BN.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    for tname, fname in _RESNET9_BLOCKS.items():
        params[fname] = {
            "Conv1d_0": _conv(sd, f"{tname}.0"),
            "BatchNorm_0": _bn_params(sd, f"{tname}.1"),
        }
        stats[fname] = {"BatchNorm_0": _bn_stats(sd, f"{tname}.1")}
    params["linear"] = _dense(sd, "linear")
    return {"params": params, "batch_stats": stats}


def torch_potes_to_flax(state_dict: Mapping[str, Any]) -> dict:
    """Potes CNN state_dict → {'params', 'batch_stats'}.

    Only cnn1 carries live parameters (the reference's forward routes every
    band through cnn1; cnn2-4 are dead branches, models.py:386-398).
    Blocks are Sequential(Sequential(Conv1d, ReLU, Pool),
    Sequential(Conv1d, ReLU, Pool, Dropout)) → convs at cnn1.0.0 / cnn1.1.0.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params = {
        "cnn1": {
            "Conv1d_0": _conv(sd, "cnn1.0.0"),
            "Conv1d_1": _conv(sd, "cnn1.1.0"),
        },
        "dimreduc": _dense(sd, "dimreduc"),
        "linear": _dense(sd, "linear"),
    }
    return {"params": params, "batch_stats": {}}


def torch_state_dict_to_flax(state_dict: Mapping[str, Any], model: str) -> dict:
    """Dispatch on the framework's model name ('resnet9*', 'Potes')."""
    if model.startswith("resnet9"):
        return torch_resnet9_to_flax(state_dict)
    if model == "Potes":
        return torch_potes_to_flax(state_dict)
    raise NotImplementedError(
        f"torch→flax conversion implemented for ResNet9 presets and Potes, "
        f"not {model!r}"
    )


def load_torch_checkpoint(path: str, model: str) -> dict:
    """Load a reference model.pth and convert (train_model.py:481-482)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu")
    except Exception:
        # torch >= 2.6 defaults weights_only=True, which rejects checkpoints
        # that pickle the whole nn.Module; retry with full unpickling (the
        # file is the user's own reference checkpoint)
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return torch_state_dict_to_flax(sd, model)


def torch_seeded_init(
    model: str,
    num_channels: int = 4,
    sig_len: int = 2500,
    num_classes: int = 2,
    seed: int = 4,
) -> dict:
    """Bit-parity FRESH-run initialization: draw the reference's exact init
    tensors with torch's RNG under ``torch.manual_seed(seed_fix)``
    (train_model.py:216-223, :293) and convert them to flax.

    Reproduces the reference's module-construction order (ResNet9_myrtle,
    models.py:520-531: conv1, conv2, res1[0], res1[1], conv3, conv4,
    res2[0], res2[1], linear) so the RNG stream is consumed identically —
    a fresh run initialized this way starts from the same weights a fresh
    reference run would (PARITY.md's only remaining init gap).
    """
    import torch
    from torch import nn

    from pcgmix_tpu.models.resnet9 import RESNET9_PRESETS

    if model not in RESNET9_PRESETS:
        raise NotImplementedError(
            f"torch-seeded init implemented for the ResNet9 presets, "
            f"not {model!r} (transplant via load_torch_checkpoint instead)"
        )
    f = RESNET9_PRESETS[model]
    linear_in = f[3] * (sig_len // 2 // 2 // 2 // 4)

    def conv_block(ci, co):
        # pool layers carry no params — construction order alone matters
        return nn.Sequential(nn.Conv1d(ci, co, 3, padding=1), nn.BatchNorm1d(co))

    torch.manual_seed(seed)

    class _Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = conv_block(num_channels, f[0])
            self.conv2 = conv_block(f[0], f[1])
            self.res1 = nn.Sequential(conv_block(f[1], f[1]), conv_block(f[1], f[1]))
            self.conv3 = conv_block(f[1], f[2])
            self.conv4 = conv_block(f[2], f[3])
            self.res2 = nn.Sequential(conv_block(f[3], f[3]), conv_block(f[3], f[3]))
            self.linear = nn.Linear(linear_in, num_classes)

    return torch_resnet9_to_flax(_Net().state_dict())
