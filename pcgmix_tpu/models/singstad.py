"""Singstad InceptionTime variants (d3 / d6 / d10).

Parity target: models.py:18-336.  Reference behaviors reproduced:

- the inception module (models.py:18-59): 1×1 bottleneck (when in>1), three
  parallel convs k=40/20/10 over the bottleneck, maxpool(3,s=1)+1×1 conv over
  the input, concat (4×nb_filters), BN, ReLU;
- WEIGHT SHARING: each model owns ONE deep block at input width ("deep1")
  and ONE at 4×nb_filters ("deep2") that is reapplied repeatedly
  (models.py:84-184) — d10 applies deep2 nine times, and shortcut2 twice;
- depth protocol on d10 (models.py:106-157); d6/d3 expose only the plain
  forward (their pass_part branches are commented out in the reference,
  models.py:203-223, :322-336).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import BatchNorm, Conv1d, Dense


class InceptionModule(nn.Module):
    bottleneck_size: int = 32
    nb_filters: int = 32
    kernel_size: int = 40
    use_bottleneck: bool = True
    train: bool = True

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        if self.use_bottleneck and c_in > 1:
            xc = Conv1d(self.bottleneck_size, 1, "SAME", use_bias=False, name="conv1")(x)
        else:
            xc = x
        ks = [self.kernel_size // (2**i) for i in range(3)]
        xs1 = Conv1d(self.nb_filters, ks[0], "SAME", use_bias=False, name="conv_s1")(xc)
        xs2 = Conv1d(self.nb_filters, ks[1], "SAME", use_bias=False, name="conv_s2")(xc)
        xs3 = Conv1d(self.nb_filters, ks[2], "SAME", use_bias=False, name="conv_s3")(xc)
        xp = nn.max_pool(x, (3,), strides=(1,), padding=((1, 1),))
        xc6 = Conv1d(self.nb_filters, 1, "SAME", use_bias=False, name="conv6")(xp)
        h = jnp.concatenate([xs1, xs2, xs3, xc6], axis=-1)
        h = BatchNorm(use_running_average=not self.train, name="batchnorm")(h)
        return nn.relu(h)


class _Shortcut(nn.Module):
    features: int
    train: bool

    @nn.compact
    def __call__(self, x):
        h = Conv1d(self.features, 1, "SAME", use_bias=False, name="conv")(x)
        return BatchNorm(use_running_average=not self.train, name="bn")(h)


class SingstadInceptionTime(nn.Module):
    """depth_variant in {3, 6, 10} selects the d3/d6/d10 topology."""

    num_classes: int = 2
    depth_variant: int = 10
    nb_filters: int = 32
    train: bool = True

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        deep1 = InceptionModule(train=self.train, name="deep1")
        deep2 = InceptionModule(train=self.train, name="deep2")  # shared!
        sc1 = _Shortcut(4 * self.nb_filters, self.train, name="shortcut1")
        sc2 = _Shortcut(4 * self.nb_filters, self.train, name="shortcut2")
        head = Dense(self.num_classes, name="linear")

        h = jnp.transpose(x, (0, 2, 1))

        def block1(inp):
            z = deep1(inp)
            z = deep2(z)
            z = deep2(z)
            return nn.relu(z + sc1(inp))

        def block2(inp):
            w = deep2(inp)
            w = deep2(w)
            w = deep2(w)
            return nn.relu(w + sc2(inp))

        if self.depth_variant == 3:
            z = block1(h)
            return head(jnp.mean(z, axis=1))
        if self.depth_variant == 6:
            z = block1(h)
            w = block2(z)
            return head(jnp.mean(w, axis=1))

        # d10, with the depth protocol (models.py:106-157)
        if part == "first":
            if depth == 0:
                return x
            z = block1(h)
            if depth == 1:
                return jnp.transpose(z, (0, 2, 1))
            w = block2(z)
            if depth == 2:
                return jnp.transpose(w, (0, 2, 1))
            y = block2(w)
            if depth == 3:
                return jnp.transpose(y, (0, 2, 1))
            v = deep2(y)
            return head(jnp.mean(v, axis=1))
        if part == "second":
            g = h if depth <= 0 else jnp.transpose(x, (0, 2, 1))
            if depth <= 0:
                g = block1(g)
            if depth <= 1:
                g = block2(g)
            if depth <= 2:
                g = block2(g)
            v = deep2(g)
            return head(jnp.mean(v, axis=1))
        z = block1(h)
        w = block2(z)
        y = block2(w)
        v = deep2(y)
        if part == "latent_space":
            return jnp.mean(v, axis=1)
        return head(jnp.mean(v, axis=1))
