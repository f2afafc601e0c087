"""ResCNN time-series classifier (tsai-style).

Parity target: models.py:720-810: a residual block (3 conv blocks + 1×1
ConvBN shortcut, ReLU) followed by three conv blocks with LeakyReLU(0.2),
PReLU and ELU(0.3) activations, global average pooling and a linear head.
Depth protocol 1..5 (models.py:757-793); depth-5 features (B, 128) are the
embedding used by the latent-space subsystem (latent_space.py:27-41).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcgmix_tpu.models.layers import BatchNorm, Conv1d, ConvBNAct, Dense


class _ResCNNBlock(nn.Module):
    nf: int
    train: bool

    @nn.compact
    def __call__(self, x):
        h = ConvBNAct(self.nf, 7, train=self.train, name="convblock1")(x)
        h = ConvBNAct(self.nf, 5, train=self.train, name="convblock2")(h)
        h = ConvBNAct(self.nf, 3, act=None, train=self.train, name="convblock3")(h)
        sc = Conv1d(self.nf, 1, "SAME", name="shortcut_conv")(x)
        sc = BatchNorm(use_running_average=not self.train, name="shortcut_bn")(sc)
        return nn.relu(h + sc)


class PReLU(nn.Module):
    """torch-default PReLU: one learnable slope initialized at 0.25."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,))
        return jnp.where(x >= 0, x, a * x)


class ResCNN(nn.Module):
    num_classes: int = 2
    nf: int = 64
    train: bool = True

    def _blocks(self):
        leaky = lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
        elu03 = lambda x: jax.nn.elu(x, alpha=0.3)
        return [
            _ResCNNBlock(self.nf, self.train, name="block1"),
            ConvBNAct(self.nf * 2, 3, act=leaky, train=self.train, name="block2"),
            None,  # block3 needs a PReLU submodule; handled inline
            ConvBNAct(self.nf * 2, 3, act=elu03, train=self.train, name="block4"),
        ]

    def _block3(self, x):
        h = ConvBNAct(self.nf * 4, 3, act=None, train=self.train, name="block3")(x)
        return PReLU(name="block3_prelu")(h)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        blocks = self._blocks()

        def run(h, from_depth, to_depth):
            # apply blocks with index in [from_depth, to_depth)
            for i in range(from_depth, to_depth):
                h = self._block3(h) if i == 2 else blocks[i](h)
            return h

        if part == "first":
            if depth == 0:
                return x
            h = jnp.transpose(x, (0, 2, 1))
            h = run(h, 0, min(depth, 4))
            if depth <= 4:
                return jnp.transpose(h, (0, 2, 1))
            h = jnp.mean(h, axis=1)
            if depth == 5:
                return h
            return Dense(self.num_classes, name="lin")(h)
        if part == "second":
            h = x
            if depth <= 4 and h.ndim == 3:
                h = jnp.transpose(h, (0, 2, 1))
            h = run(h, max(depth, 0), 4)
            if depth <= 4:
                h = jnp.mean(h, axis=1)
            return Dense(self.num_classes, name="lin")(h)
        h = jnp.transpose(x, (0, 2, 1))
        h = run(h, 0, 4)
        h = jnp.mean(h, axis=1)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="lin")(h)
