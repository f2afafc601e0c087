"""XResNet1d — the fastai/tsai 1-D xresnet wired into the reference
(train_model.py:308-311: ``tsai.models.XResNet1d.xresnet1d18(4, 2)`` and
``XResNet1dPlus.xresnet1d18plus(4, 2)``).

Reimplemented from the published architecture (tsai is not in this image;
no bit-parity oracle).  xresnet18 structure ("Bag of Tricks" tweaks):

- stem: three 3-tap conv-BN-ReLU blocks (c_in→32 stride 2, 32→32, 32→64),
  then MaxPool(3, stride 2, pad 1);
- 4 stages of 2 BasicBlocks with widths [64, 128, 256, 512], stride 2 at
  each stage entry except the first;
- BasicBlock: conv-BN-ReLU(3, stride) → conv-BN(3) added to an identity
  shortcut (ResNet-D downsample when shape changes: AvgPool(2, ceil) →
  1×1 conv-BN), then ReLU;
- head: GAP → linear.

The Plus variant differs in tsai only by block plumbing conveniences and
head composition options (defaults identical) — the registry maps
'XResNet1d18Plus' to this class.  Initialization follows the repo's
torch-default policy (models/layers.py wrappers throughout).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import (
    BatchNorm, Conv1d, ConvBNAct, Dense, gap_1d,
)


def _avg_pool_ceil(x, window: int = 2):
    """torch AvgPool1d(2, ceil_mode=True) on (B, T, C) (the ResNet-D
    downsample path).  The ceil-overhang bin averages only the VALID
    elements (torch counts implicit ceil overhang as out-of-window;
    count_include_pad applies to explicit zero padding only, and there is
    none here)."""
    t = x.shape[1]
    rem = t % window
    if rem:
        x = jnp.pad(x, ((0, 0), (0, window - rem), (0, 0)))
    out = nn.avg_pool(x, (window,), strides=(window,), padding="VALID")
    if rem:
        # rescale the ragged last bin: mean over `window` → mean over `rem`
        out = out.at[:, -1].multiply(window / rem)
    return out


class _BasicBlock(nn.Module):
    nf: int
    stride: int
    train: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # conv-BN-ReLU(3, stride) — torch pad=1, repo torch-parity init
        h = Conv1d(
            self.nf, 3, padding=1, stride=self.stride, use_bias=False,
            dtype=self.dtype, name="convpath1_conv",
        )(x)
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="convpath1_bn")(h)
        h = nn.relu(h)
        h = ConvBNAct(self.nf, 3, act=None, train=self.train,
                      dtype=self.dtype, name="convpath2")(h)
        sc = x
        if self.stride > 1:
            sc = _avg_pool_ceil(sc, self.stride)
        if sc.shape[-1] != self.nf:
            sc = ConvBNAct(self.nf, 1, act=None, train=self.train,
                           dtype=self.dtype, name="idpath")(sc)
        return nn.relu(h + sc)


class XResNet1d18(nn.Module):
    num_classes: int = 2
    widths: tuple = (64, 128, 256, 512)
    blocks_per_stage: int = 2
    train: bool = True
    dtype: Any = None  # computation dtype (bfloat16 = full-rate MXU)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))
        # stem (stride-2 first conv): strided conv + BN + ReLU, then 2 blocks
        h = Conv1d(32, 3, padding=1, stride=2, use_bias=False,
                   dtype=self.dtype, name="stem0_conv")(h)
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="stem0_bn")(h)
        h = nn.relu(h)
        h = ConvBNAct(32, 3, train=self.train, dtype=self.dtype, name="stem1")(h)
        h = ConvBNAct(64, 3, train=self.train, dtype=self.dtype, name="stem2")(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3,), strides=(2,), padding="VALID")
        for s, nf in enumerate(self.widths):
            for b in range(self.blocks_per_stage):
                stride = 2 if (s > 0 and b == 0) else 1
                h = _BasicBlock(nf, stride, self.train, dtype=self.dtype,
                                name=f"stage{s}_block{b}")(h)
        h = gap_1d(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="fc")(h)
