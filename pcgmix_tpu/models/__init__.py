"""Flax model zoo mirroring the reference's models.py / models2d.py.

All models follow the split-forward protocol of the reference
(models.py:532-566, models2d.py:29-63): ``model(x)`` is the full forward,
``model(x, depth=d, part='first')`` returns the activation after block d,
``model(x, depth=d, part='second')`` resumes from that activation, and
``part='latent_space'`` returns the embedding before the classifier head.
``depth``/``part`` are Python-static, so each combination is its own XLA
compilation (the reference draws depth from ≤5 values).

Public tensors are channel-first (B, C, T) / (B, C, F, T) to match the data
contract; convolutions run internally in channel-last layout for TPU.
"""

from pcgmix_tpu.models.registry import build_model, MODEL_NAMES

__all__ = ["build_model", "MODEL_NAMES"]
