"""Potes 1-D CNN — per-band conv branches with *shared* weights.

Parity target: models.py:358-465.  Notable reference behaviors reproduced:

- all four band branches run through the SAME conv stack (the reference
  defines cnn1..cnn4 but its forward applies ``self.cnn1`` to every band,
  models.py:387-398 — the extra stacks are dead parameters);
- conv blocks are k=5, pad=1 (length shrinks by 2), MaxPool(2), dropout 0.25
  after the second block (models.py:359-365);
- branch outputs are flattened, concatenated, reduced to 20 dims, ReLU,
  dropout 0.5, then the classifier (models.py:379-381).

Depth protocol (models.py:383-424): depth 1 == the 20-d hidden features
(after dropout); 'latent_space' returns the same.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import Conv1d, Dense, flatten_torch, max_pool_1d


class _PotesBranch(nn.Module):
    layers: Sequence[int]
    dropout: float
    train: bool
    dtype: Any = None
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.layers[0], 5, padding=1, dtype=self.dtype,
                   impl=self.conv_impl)(x)
        x = nn.relu(x)
        x = max_pool_1d(x, 2)
        x = Conv1d(self.layers[1], 5, padding=1, dtype=self.dtype,
                   impl=self.conv_impl)(x)
        x = nn.relu(x)
        x = max_pool_1d(x, 2)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not self.train)(x)
        return x


class PotesCNN(nn.Module):
    num_classes: int = 2
    layers: Sequence[int] = (8, 4)
    dropout: float = 0.25
    train: bool = True
    dtype: Any = None
    conv_impl: str = "xla"

    def _features(self, x):
        branch = _PotesBranch(self.layers, self.dropout, self.train,
                              dtype=self.dtype, conv_impl=self.conv_impl,
                              name="cnn1")
        outs = []
        for c in range(x.shape[1]):
            band = jnp.transpose(x[:, c : c + 1, :], (0, 2, 1))  # (B, T, 1)
            outs.append(flatten_torch(branch(band)))
        h = jnp.concatenate(outs, axis=1)
        h = nn.relu(Dense(20, name="dimreduc")(h))
        h = nn.Dropout(0.5, deterministic=not self.train)(h)
        return h

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        if part == "first":
            if depth == 0:
                return x
            return self._features(x)
        if part == "second":
            h = self._features(x) if depth <= 0 else x
            return Dense(self.num_classes, name="linear")(h)
        h = self._features(x)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="linear")(h)


# Width presets (models.py:339-356).
POTES_PRESETS = {
    "Potes": dict(layers=(8, 4), dropout=0.25),
    "Potes(noDropout)": dict(layers=(8, 4), dropout=0.0),
    "PotesBig128and64": dict(layers=(128, 64), dropout=0.25),
    "PotesBig64and32": dict(layers=(64, 32), dropout=0.25),
    "Potes0.1": dict(layers=(2, 1), dropout=0.25),
    "Potes0.02": dict(layers=(1, 1), dropout=0.25),
}
