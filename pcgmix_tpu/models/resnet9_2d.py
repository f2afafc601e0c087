"""2-D ResNet9 for mel-spectrogram inputs.

Parity target: models2d.py:13-87 — same topology as the 1-D flagship with
2-D convs/pools, in_channels=1; the classifier size falls out of the input
resolution (8192 for 128², 2048 for 64², models2d.py:86-87,
train_model.py:294-302).  Depth protocol: models2d.py:29-63.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import (
    BatchNorm,
    Conv2d,
    Dense,
    flatten_torch_2d,
    max_pool_2d,
)


class _ConvBlock2d(nn.Module):
    features: int
    pool: bool = False
    train: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, 3, padding=1, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.pool:
            x = max_pool_2d(x, 2)
        return x


class ResNet9_2D(nn.Module):
    """Input (B, C=1, F, T) channel-first; returns (B, num_classes) logits."""

    num_classes: int = 2
    filters: Sequence[int] = (64, 128, 256, 512)
    train: bool = True
    dtype: Any = None

    def _block(self, features, name, pool=False):
        return _ConvBlock2d(features, pool=pool, train=self.train,
                            dtype=self.dtype, name=name)

    def stage1(self, x):
        x = self._block(self.filters[0], "conv1")(x)
        x = self._block(self.filters[1], "conv2", pool=True)(x)
        r = self._block(self.filters[1], "res1a")(x)
        r = self._block(self.filters[1], "res1b")(r)
        return r + x

    def stage2(self, x):
        x = self._block(self.filters[2], "conv3", pool=True)(x)
        x = self._block(self.filters[3], "conv4", pool=True)(x)
        r = self._block(self.filters[3], "res2a")(x)
        r = self._block(self.filters[3], "res2b")(r)
        return r + x

    def stage3(self, x):
        return flatten_torch_2d(max_pool_2d(x, 4))

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        to_hwc = lambda a: jnp.transpose(a, (0, 2, 3, 1))
        to_chw = lambda a: jnp.transpose(a, (0, 3, 1, 2))
        if part == "first":
            if depth == 0:
                return x
            h = self.stage1(to_hwc(x))
            if depth == 1:
                return to_chw(h)
            h = self.stage2(h)
            if depth == 2:
                return to_chw(h)
            h = self.stage3(h)
            if depth == 3:
                return h
            return Dense(self.num_classes, name="linear")(h)
        if part == "second":
            h = x
            if depth <= 2 and h.ndim == 4:
                h = to_hwc(h)
            if depth <= 0:
                h = self.stage1(h)
            if depth <= 1:
                h = self.stage2(h)
            if depth <= 2:
                h = self.stage3(h)
            return Dense(self.num_classes, name="linear")(h)
        h = self.stage1(to_hwc(x))
        h = self.stage2(h)
        h = self.stage3(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="linear")(h)
