"""1-D ResNet9 (myrtle-style) — the flagship time-series model.

Parity target: models.py:520-589 (``ResNet9_myrtle`` with the configurable
width table) and the width presets in train_model.py:337-358.  Structure:

  conv1(k3) → conv2(k3, pool2) → res1(2×conv) + skip     [depth 1]
  conv3(k3, pool2) → conv4(k3, pool2) → res2 + skip      [depth 2]
  maxpool4 → flatten                                     [depth 3]
  linear → logits
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import (
    BatchNorm,
    Conv1d,
    Dense,
    flatten_torch,
    max_pool_1d,
)


class _ConvBlock(nn.Module):
    features: int
    pool: bool = False
    train: bool = True
    dtype: Any = None
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.features, 3, padding=1, dtype=self.dtype,
                   impl=self.conv_impl)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.pool:
            x = max_pool_1d(x, 2)
        return x


class ResNet9_1D(nn.Module):
    """Input (B, C, T) channel-first; returns (B, num_classes) logits."""

    num_classes: int = 2
    filters: Sequence[int] = (64, 128, 256, 512)
    train: bool = True
    dtype: Any = None  # computation dtype (bfloat16 = full-rate MXU)
    conv_impl: str = "xla"  # "matmul" = shifted-dot_general convs (same
                            # params/math; the gang-training fast path —
                            # see layers._MatmulConv1d)

    def _block(self, features, name, pool=False):
        return _ConvBlock(features, pool=pool, train=self.train,
                          dtype=self.dtype, conv_impl=self.conv_impl,
                          name=name)

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
        return flatten_torch(max_pool_1d(x, 4))

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        if part == "first":
            if depth == 0:
                return x
            h = jnp.transpose(x, (0, 2, 1))
            h = self.stage1(h)
            if depth == 1:
                return jnp.transpose(h, (0, 2, 1))
            h = self.stage2(h)
            if depth == 2:
                return jnp.transpose(h, (0, 2, 1))
            h = self.stage3(h)
            if depth == 3:
                return h
            return Dense(self.num_classes, name="linear")(h)
        if part == "second":
            h = x
            if depth <= 2 and h.ndim == 3:
                h = jnp.transpose(h, (0, 2, 1))
            if depth <= 0:
                h = self.stage1(h)
            if depth <= 1:
                h = self.stage2(h)
            if depth <= 2:
                h = self.stage3(h)
            return Dense(self.num_classes, name="linear")(h)
        # full forward ('latent_space' == flattened features, depth 3)
        h = jnp.transpose(x, (0, 2, 1))
        h = self.stage1(h)
        h = self.stage2(h)
        h = self.stage3(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="linear")(h)


# Width presets (train_model.py:341-358).  The `linear` sizes in the
# reference are implied by T=2500; they fall out of the shapes here.
RESNET9_PRESETS = {
    "resnet9": (64, 128, 256, 512),
    "resnet9-5k": (2, 4, 8, 16),
    "resnet9-15k": (4, 8, 16, 32),
    "resnet9-50k": (8, 16, 32, 64),
    "resnet9-150k": (16, 32, 64, 128),
    "resnet9-600k": (32, 64, 128, 256),
    "resnet9-1.4m": (64, 128, 192, 384),
    "resnet9-2.3m": (64, 128, 256, 512),
    "resnet9-5m": (96, 192, 384, 768),
    "resnet9-9m": (128, 256, 512, 1024),
}
