"""Recurrent and gated-MLP models from the reference's tsai zoo.

Parity target: train_model.py:377-381 (``tsai.models.RNN.RNN/LSTM/GRU(4, 2)``)
and :322-323 (``tsai.models.gMLP.gMLP(4, 2, args.sig_len)``).  tsai is not
in this image; these are reimplementations of the published architectures
(tsai 0.3.x defaults), not bit-parity ports.

- RNN/LSTM/GRU: one recurrent layer, hidden 100, batch-first over the
  (B, T, C) sequence; classifier on the LAST step's output
  (``output[:, -1]``).  fc_dropout defaults to 0 in tsai, so no dropout
  layer materializes.
- gMLP: patch embedding (patch_size=1 ⇒ a 1×1 conv to d_model=256), 6
  gMLP blocks (LayerNorm → Dense to d_ffn=512 → GELU → spatial gating
  unit → Dense back, residual), mean over tokens → linear head.  The
  spatial gating unit splits channels in half, LayerNorms the gate half,
  applies a length-T Dense along the TIME axis (near-zero weight, ones
  bias init, as the gMLP paper prescribes) and multiplies.

TPU notes: the recurrent models run as a ``flax.linen.RNN`` time scan —
sequential by nature, included for API surface rather than speed; gMLP's
spatial Dense is a (T×T) matmul per block, an MXU-native op.

Protocol: ``depth``/``part`` accepted for uniformity,
``part='latent_space'`` = pre-head features, no split forward (the
reference's tsai models crash under latentmixup the same way).
Initialization follows the repo's torch-default policy (models/layers.py);
recurrent cells use torch's U(±1/√hidden) for every weight and bias, and
gMLP's spatial projection keeps the paper-prescribed near-zero/ones init.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import Conv1d, Dense, make_torch_bias_init


class TsaiRNN(nn.Module):
    """tsai _RNN_Base with cell_type ∈ {'rnn', 'lstm', 'gru'}."""

    num_classes: int = 2
    hidden_size: int = 100
    cell_type: str = "lstm"
    train: bool = True

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))  # (B, T, C)
        # torch initializes EVERY recurrent weight/bias U(±1/√hidden)
        # (nn.RNNBase.reset_parameters) — match that distribution instead
        # of flax's lecun_normal/orthogonal defaults (repo torch-parity
        # init policy, models/layers.py)
        u = make_torch_bias_init(self.hidden_size)
        init_kw = dict(
            kernel_init=u, recurrent_kernel_init=u, bias_init=u,
        )
        cell = {
            "rnn": lambda: nn.SimpleCell(features=self.hidden_size, **init_kw),
            "lstm": lambda: nn.OptimizedLSTMCell(
                features=self.hidden_size, **init_kw
            ),
            "gru": lambda: nn.GRUCell(features=self.hidden_size, **init_kw),
        }[self.cell_type]()
        out = nn.RNN(cell, name="rnn")(h)  # (B, T, H)
        last = out[:, -1]
        if part == "latent_space":
            return last
        return Dense(self.num_classes, name="fc")(last)


class _SpatialGatingUnit(nn.Module):
    """Split channels → LayerNorm gate half → time-axis Dense (W≈0, b=1)
    → elementwise gate (gMLP paper §2; tsai _SpatialGatingUnit)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        u, v = jnp.split(x, 2, axis=-1)
        v = nn.LayerNorm(name="norm")(v)
        t = v.shape[1]
        v = jnp.swapaxes(v, 1, 2)  # (B, C/2, T)
        v = nn.Dense(
            t,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=1e-4),
            bias_init=nn.initializers.ones,
            name="spatial_proj",
        )(v)
        v = jnp.swapaxes(v, 1, 2)
        return u * v


class _GMLPBlock(nn.Module):
    d_ffn: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d_model = x.shape[-1]
        h = nn.LayerNorm(name="norm")(x)
        h = Dense(self.d_ffn, dtype=self.dtype, name="proj_in")(h)
        h = nn.gelu(h)
        h = _SpatialGatingUnit(dtype=self.dtype, name="sgu")(h)
        h = Dense(d_model, dtype=self.dtype, name="proj_out")(h)
        return x + h


class GMLP(nn.Module):
    """tsai gMLP(c_in, c_out, seq_len): patch_size=1, d_model=256,
    d_ffn=512, depth=6."""

    num_classes: int = 2
    d_model: int = 256
    d_ffn: int = 512
    depth: int = 6
    patch_size: int = 1
    train: bool = True
    dtype: Any = None  # computation dtype for the MXU-heavy blocks

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))  # (B, T, C)
        # patch embedding: Conv1d(c_in, d_model, patch, stride=patch)
        h = Conv1d(
            self.d_model, self.patch_size, padding=0, stride=self.patch_size,
            dtype=self.dtype, name="patcher",
        )(h)
        for i in range(self.depth):
            h = _GMLPBlock(self.d_ffn, dtype=self.dtype, name=f"block{i}")(h)
        h = jnp.mean(h, axis=1)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="head")(h)
