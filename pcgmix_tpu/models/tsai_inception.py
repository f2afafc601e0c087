"""InceptionTime / XceptionTime families from the reference's tsai zoo.

Parity target: the tsai model names wired into the reference's selection
ladder (train_model.py:314-321 — ``tsai.models.InceptionTime.InceptionTime``,
``InceptionTimePlus``, ``XceptionTime``, ``XceptionTimePlus``, all
instantiated as ``(4, 2)``).  None of these appear in the published
experiments; the reference imports them from the third-party ``tsai``
package, which is not in this image, so these are reimplementations of the
published tsai architectures (tsai 0.3.x), not bit-parity ports:

- InceptionTime: 6 inception modules (bottleneck 1×1 → parallel convs
  ks [39, 19, 9] + maxpool→1×1 branch, concat → BN → ReLU), residual
  every 3 modules, GAP → linear.  nf=32 ⇒ trunk width 128.
- InceptionTimePlus: same trunk; tsai's "Plus" head (GAP → flatten →
  linear).  Plus-only options (coord conv, separable, sa/se) are off by
  default in tsai and not replicated.
- XceptionTime: 4 xception modules (bottleneck → parallel *separable*
  convs ks [39, 19, 9] + maxpool→1×1, plain concat), width doubling per
  module with a 1×1-conv residual every 2; head = adaptive-avg-pool(50) →
  three 1×1 conv-BN-ReLU stages (512→256→128→c_out) → GAP.
- XceptionTimePlus: same trunk and head shape as XceptionTime here (the
  tsai Plus variant differs only in block plumbing conveniences).

All follow the repo model protocol: ``(B, C, T)`` input, ``depth``/``part``
kwargs accepted for API uniformity, ``part='latent_space'`` returns the
pre-head features.  Initialization follows the repo's torch-default policy
(models/layers.py: kaiming-uniform U(±1/√fan_in)), matching what torch
would give these architectures.  Like the reference's tsai models, there is no
part='first'/'second' split forward (latentmixup crashes there too —
models/registry.py:max_latent_depth).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import (
    BatchNorm, Conv1d, ConvBNAct, Dense, gap_1d, torch_conv_kernel_init,
)


def _odd_ks(ks: int) -> tuple[int, int, int]:
    """tsai's kernel ladder: [ks//1, ks//2, ks//4], each forced odd."""
    out = []
    for i in range(3):
        k = ks // (2**i)
        out.append(k - 1 if k % 2 == 0 else k)
    return tuple(out)


def max_pool_same_1d(x):
    """torch MaxPool1d(3, stride=1, padding=1) on (B, T, C)."""
    return nn.max_pool(x, (3,), strides=(1,), padding=((1, 1),))


class SeparableConv1d(nn.Module):
    """Depthwise (groups=ni) + pointwise 1×1, both bias-free (tsai
    SeparableConv1d as used by XceptionModule)."""

    features: int
    kernel_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ni = x.shape[-1]
        # torch-parity init: grouped-conv kernel (k, in/groups, out) has
        # fan_in = k·(in/groups), which torch_conv_kernel_init reads off
        # the kernel shape
        h = nn.Conv(
            ni, (self.kernel_size,), padding="SAME", feature_group_count=ni,
            use_bias=False, dtype=self.dtype,
            kernel_init=torch_conv_kernel_init, name="depthwise",
        )(x)
        return Conv1d(self.features, 1, "SAME", use_bias=False,
                      dtype=self.dtype, name="pointwise")(h)


class InceptionModule(nn.Module):
    """Bottleneck → convs ks [39,19,9] ∥ maxpool→1×1, concat → BN → ReLU."""

    nf: int
    ks: int = 40
    train: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ni = x.shape[-1]
        h = (
            Conv1d(self.nf, 1, "SAME", use_bias=False, dtype=self.dtype,
                   name="bottleneck")(x)
            if ni > 1
            else x
        )
        branches = [
            Conv1d(self.nf, k, "SAME", use_bias=False, dtype=self.dtype,
                   name=f"conv{i}")(h)
            for i, k in enumerate(_odd_ks(self.ks))
        ]
        mp = Conv1d(self.nf, 1, "SAME", use_bias=False, dtype=self.dtype,
                    name="mp_conv")(max_pool_same_1d(x))
        out = jnp.concatenate(branches + [mp], axis=-1)
        out = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                        name="bn")(out)
        return nn.relu(out)


class InceptionTime(nn.Module):
    """tsai InceptionTime(c_in, c_out): depth-6 trunk, residual every 3."""

    num_classes: int = 2
    nf: int = 32
    depth: int = 6
    train: bool = True
    dtype: Any = None  # computation dtype (bfloat16 = full-rate MXU)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))
        res = h
        for d in range(self.depth):
            h = InceptionModule(self.nf, train=self.train, dtype=self.dtype,
                                name=f"inception{d}")(h)
            if d % 3 == 2:
                ni, no = res.shape[-1], h.shape[-1]
                if ni == no:
                    sc = BatchNorm(
                        use_running_average=not self.train, dtype=self.dtype,
                        name=f"shortcut{d // 3}"
                    )(res)
                else:
                    sc = ConvBNAct(
                        no, 1, act=None, train=self.train, dtype=self.dtype,
                        name=f"shortcut{d // 3}"
                    )(res)
                h = nn.relu(h + sc)
                res = h
        h = gap_1d(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="fc")(h)


class XceptionModule(nn.Module):
    """Bottleneck → separable convs ks [39,19,9] ∥ maxpool→1×1, concat
    (no BN/act inside the module — tsai XceptionModule)."""

    nf: int
    ks: int = 40
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = Conv1d(self.nf, 1, "SAME", use_bias=False, dtype=self.dtype,
                   name="bottleneck")(x)
        branches = [
            SeparableConv1d(self.nf, k, dtype=self.dtype, name=f"sepconv{i}")(h)
            for i, k in enumerate(_odd_ks(self.ks))
        ]
        mp = Conv1d(self.nf, 1, "SAME", use_bias=False, dtype=self.dtype,
                    name="mp_conv")(max_pool_same_1d(x))
        return jnp.concatenate(branches + [mp], axis=-1)


def adaptive_avg_pool_1d(x, out_size: int):
    """torch AdaptiveAvgPool1d on (B, T, C): bin i averages
    [floor(i·T/out), ceil((i+1)·T/out)) — exact torch bin edges, static
    shapes (out_size Python-level)."""
    t = x.shape[1]
    cols = []
    for i in range(out_size):
        s = (i * t) // out_size
        e = -(-((i + 1) * t) // out_size)
        cols.append(jnp.mean(x[:, s:e], axis=1))
    return jnp.stack(cols, axis=1)


class XceptionTime(nn.Module):
    """tsai XceptionTime(c_in, c_out, nf=16): 4 width-doubling xception
    modules with 1×1-conv residuals every 2, conv head over 50 pooled
    steps."""

    num_classes: int = 2
    nf: int = 16
    depth: int = 4
    train: bool = True
    dtype: Any = None  # computation dtype (bfloat16 = full-rate MXU)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))
        res = h
        for d in range(self.depth):
            h = XceptionModule(self.nf * 2**d, dtype=self.dtype,
                               name=f"xception{d}")(h)
            if d % 2 == 1:
                sc = ConvBNAct(
                    h.shape[-1], 1, act=None, train=self.train,
                    dtype=self.dtype, name=f"shortcut{d // 2}",
                )(res)
                h = nn.relu(h + sc)
                res = h
        head_nf = self.nf * 4 * 2 ** (self.depth - 1)  # 512 at nf=16
        h = adaptive_avg_pool_1d(h, 50)
        h = ConvBNAct(head_nf // 2, 1, train=self.train, dtype=self.dtype,
                      name="head1")(h)
        h = ConvBNAct(head_nf // 4, 1, train=self.train, dtype=self.dtype,
                      name="head2")(h)
        if part == "latent_space":
            return gap_1d(h)
        h = ConvBNAct(self.num_classes, 1, train=self.train, dtype=self.dtype,
                      name="head3")(h)
        # logits in fp32 like every Dense-headed model (loss math precision)
        return gap_1d(h).astype(jnp.float32)
