"""ResNet time-series classifier (tsai-style).

Parity target: models.py:812-863: three residual blocks (conv kss [7,5,3]
with a BN-or-1×1-conv shortcut), GAP, linear.  The reference forward takes
no depth/pass_part arguments (train_model.py:534 routes it through the plain
call), but we expose the same protocol for API uniformity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import BatchNorm, ConvBNAct, Dense, gap_1d


class _ResBlock(nn.Module):
    nf: int
    train: bool

    @nn.compact
    def __call__(self, x):
        ni = x.shape[-1]
        h = ConvBNAct(self.nf, 7, train=self.train, name="convblock1")(x)
        h = ConvBNAct(self.nf, 5, train=self.train, name="convblock2")(h)
        h = ConvBNAct(self.nf, 3, act=None, train=self.train, name="convblock3")(h)
        if ni == self.nf:
            sc = BatchNorm(use_running_average=not self.train, name="shortcut_bn")(x)
        else:
            sc = ConvBNAct(self.nf, 1, act=None, train=self.train, name="shortcut")(x)
        return nn.relu(h + sc)


class ResNetTS(nn.Module):
    num_classes: int = 2
    nf: int = 64
    train: bool = True

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))
        h = _ResBlock(self.nf, self.train, name="resblock1")(h)
        h = _ResBlock(self.nf * 2, self.train, name="resblock2")(h)
        h = _ResBlock(self.nf * 2, self.train, name="resblock3")(h)
        h = gap_1d(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="fc")(h)
