"""XCM, OmniScaleCNN and mWDN from the reference's tsai zoo.

Parity target: train_model.py:324-327 (``tsai.models.XCM.XCM(4, 2,
args.sig_len)`` / ``XCMPlus``), :383-384 (``OmniScaleCNN(4, 2, 2500)``),
:382 (``mWDN(4, 2, 2500)``).  tsai is not in this image; these are
reimplementations of the published tsai 0.3.x architectures, not
bit-parity ports.

- XCM (explainable CNN, Fauvel et al.): a 2-D branch convolving each
  variable independently over time ((1, window) kernels on the (C, T)
  plane → 1×1 down to one map) concatenated with a 1-D branch (window-tap
  conv over all variables → 1×1), then a window-tap conv trunk → GAP →
  linear.  window = round(seq_len · window_perc), window_perc = 1.0.
  XCMPlus differs in tsai only by plumbing conveniences → same class.
- OmniScaleCNN (Tang et al.): three layers of parallel convolutions whose
  kernel sizes are {1, 2} ∪ primes up to min(seq_len/4, 89), channel
  counts derived from fixed parameter budgets (the published generation
  rule is reproduced verbatim in :func:`omniscale_layer_parameters`);
  each layer concatenates branch outputs after conv+BN, then ReLU; head
  GAP → linear.
- mWDN (multilevel wavelet decomposition network, Wang et al.): per
  level, two learnable (T, T) time-axis linears initialized with db4
  low/high-pass coefficients on the band diagonals plus small noise,
  sigmoid, AvgPool(2); the high-pass outputs of all levels plus the final
  low-pass are concatenated along TIME (total length ≈ T) and classified
  by an InceptionTime trunk (tsai's default base_arch InceptionTimePlus).

Protocol: ``depth``/``part`` accepted for uniformity,
``part='latent_space'`` = pre-head features, no split forward.
Initialization follows the repo's torch-default policy (models/layers.py),
except mWDN's band matrices (tsai-prescribed db4-diagonal init).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pcgmix_tpu.models.layers import (
    BatchNorm, Conv1d, Conv2d, Dense, gap_1d, make_torch_bias_init,
    torch_conv_kernel_init,
)
from pcgmix_tpu.models.tsai_inception import InceptionTime


class XCM(nn.Module):
    """tsai XCM(c_in, c_out, seq_len, nf=128, window_perc=1.0)."""

    num_classes: int = 2
    nf: int = 128
    window_perc: float = 1.0
    train: bool = True
    dtype: Any = None  # computation dtype (bfloat16 = full-rate MXU)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        # x: (B, C, T)
        t = x.shape[-1]
        window = max(1, int(round(t * self.window_perc)))
        bn = lambda name: BatchNorm(use_running_average=not self.train,
                                    dtype=self.dtype, name=name)

        # 2-D branch: per-variable temporal conv, (B, C, T, 1) images
        # (torch-parity init: fan_in = 1·window read off the kernel shape)
        h2 = x[..., None]  # (B, C, T, 1)
        h2 = nn.Conv(
            self.nf, (1, window), padding="SAME", use_bias=True,
            dtype=self.dtype, kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(window), name="conv2d",
        )(h2)
        h2 = bn("bn2d")(h2)
        h2 = nn.relu(h2)
        h2 = Conv2d(1, 1, "SAME", dtype=self.dtype, name="conv2d_1x1")(h2)
        h2 = nn.relu(h2)[..., 0]  # (B, C, T)
        h2 = jnp.transpose(h2, (0, 2, 1))  # (B, T, C)

        # 1-D branch over all variables
        h1 = jnp.transpose(x, (0, 2, 1))  # (B, T, C)
        h1 = Conv1d(self.nf, window, "SAME", dtype=self.dtype, name="conv1d")(h1)
        h1 = bn("bn1d")(h1)
        h1 = nn.relu(h1)
        h1 = Conv1d(1, 1, "SAME", dtype=self.dtype, name="conv1d_1x1")(h1)
        h1 = nn.relu(h1)  # (B, T, 1)

        h = jnp.concatenate([h2, h1], axis=-1)  # (B, T, C+1)
        h = Conv1d(self.nf, window, "SAME", dtype=self.dtype, name="conv1d_top")(h)
        h = bn("bn_top")(h)
        h = nn.relu(h)
        h = gap_1d(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="head")(h)


def _primes_incl_one(start: int, end: int) -> list[int]:
    """tsai's get_Prime_number_in_a_range — trial division that admits 1
    (the OS-CNN kernel set is {1, 2} ∪ primes)."""
    out = []
    for val in range(start, end + 1):
        if all(val % n for n in range(2, val)):
            out.append(val)
    return out


def omniscale_layer_parameters(
    seq_len: int, c_in: int
) -> list[list[tuple[int, int, int]]]:
    """tsai's generate_layer_parameter_list with the OmniScaleCNN defaults:
    budgets [8·128·c_in, 5·128·256 + 2·256·128], kernel range
    [1, min(seq_len//4, 89)].  Returns per-layer (in, out, ks) tuples."""
    budgets = [8 * 128 * c_in, 5 * 128 * 256 + 2 * 256 * 128]
    end = max(1, min(int(seq_len / 4), 89))
    primes = _primes_incl_one(1, end)
    s = sum(primes)

    def out_ch(budget: int, in_ch: int) -> int:
        return max(1, int(budget / (in_ch * s)))

    layers = []
    in_ch = c_in
    for budget in budgets:
        oc = out_ch(budget, in_ch)
        layers.append([(in_ch, oc, p) for p in primes])
        in_ch = len(primes) * oc
    first_oc = len(primes) * out_ch(budgets[0], c_in)
    layers.append([(in_ch, first_oc, 1), (in_ch, first_oc, 2)])
    return layers


class _OmniScaleLayer(nn.Module):
    """Parallel same-padded conv+BN branches, concat, ReLU (tsai
    build_layer_with_layer_parameter; even kernels pad ((k-1)//2, k//2))."""

    params: Sequence[tuple[int, int, int]]
    train: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, (_in_ch, oc, ks) in enumerate(self.params):
            # tsai SampaddingConv1D_BN pads ((ks-1)//2, ks//2) — asymmetric
            # for even kernels; passed as an explicit per-dim pair
            pad = (((ks - 1) // 2, ks // 2),)
            h = Conv1d(oc, ks, padding=pad, dtype=self.dtype, name=f"conv{i}")(x)
            h = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                          name=f"bn{i}")(h)
            outs.append(h)
        return nn.relu(jnp.concatenate(outs, axis=-1))


class OmniScaleCNN(nn.Module):
    """tsai OmniScaleCNN(c_in, c_out, seq_len)."""

    num_classes: int = 2
    train: bool = True
    dtype: Any = None  # computation dtype (bfloat16 = full-rate MXU)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))  # (B, T, C)
        for li, layer in enumerate(
            omniscale_layer_parameters(x.shape[-1], x.shape[1])
        ):
            h = _OmniScaleLayer(tuple(layer), self.train, dtype=self.dtype,
                                name=f"layer{li}")(h)
        h = gap_1d(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="hidden")(h)


# db4 decomposition filters as tsai hardcodes them (mWDN.py).
_MWDN_H = (-0.2304, 0.7148, -0.6309, -0.0280, 0.1870, 0.0308, -0.0329, -0.0106)
_MWDN_L = (-0.0106, 0.0329, 0.0308, -0.1870, -0.0280, 0.6309, 0.7148, 0.2304)


def _mwdn_kernel_init(filters: tuple, p: int):
    """tsai WaveBlock.create_W as a flax Dense kernel init: N(0, 1)·0.1·ε
    noise with the filter coefficients written onto the leading band
    diagonals.  flax kernel (in=j, out=i) == torch weight[i, j]."""
    eps = min(abs(f) for f in filters)
    band = np.zeros((p, p), np.float32)
    mask = np.zeros((p, p), bool)
    for k, f in enumerate(filters):
        idx = np.arange(p - k)
        band[idx + k, idx] = f
        mask[idx + k, idx] = True

    def init(key, shape, dtype=jnp.float32):
        assert shape == (p, p), shape
        noise = jax.random.normal(key, shape, dtype) * (0.1 * eps)
        return jnp.where(jnp.asarray(mask), jnp.asarray(band, dtype), noise)

    return init


class _WaveBlock(nn.Module):
    """sigmoid(H·x), sigmoid(L·x) then AvgPool(2) (tsai WaveBlock); the
    (T, T) linears act along the time axis of every channel."""

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C) → time-axis linear means transposing to (B, C, T)
        h = jnp.swapaxes(x, 1, 2)
        p = h.shape[-1]
        # biases keep the torch Linear default U(±1/√p) (tsai replaces only
        # the weight matrices with the band init)
        hp = nn.Dense(
            p, kernel_init=_mwdn_kernel_init(_MWDN_H, p),
            bias_init=make_torch_bias_init(p), name="mWDN_H",
        )(h)
        lp = nn.Dense(
            p, kernel_init=_mwdn_kernel_init(_MWDN_L, p),
            bias_init=make_torch_bias_init(p), name="mWDN_L",
        )(h)
        hp = jax.nn.sigmoid(hp)
        lp = jax.nn.sigmoid(lp)
        # AvgPool1d(2) along time (drop ragged tail, torch floor mode)
        def pool(z):
            t = z.shape[-1]
            z = z[..., : (t // 2) * 2]
            return z.reshape(z.shape[:-1] + (t // 2, 2)).mean(-1)

        return jnp.swapaxes(pool(lp), 1, 2), jnp.swapaxes(pool(hp), 1, 2)


class MWDN(nn.Module):
    """tsai mWDN(c_in, c_out, seq_len): levels=3, base_arch
    InceptionTimePlus (the InceptionTime trunk here)."""

    num_classes: int = 2
    levels: int = 3
    train: bool = True
    dtype: Any = None  # computation dtype (applies to the trunk; the
                       # (T, T) wave linears stay fp32 — sigmoid-saturated)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        h = jnp.transpose(x, (0, 2, 1))  # (B, T, C)
        hps = []
        for i in range(self.levels):
            h, hp = _WaveBlock(name=f"wdn{i + 1}")(h)
            hps.append(hp)
        seq = jnp.concatenate(hps + [h], axis=1)  # concat along time
        return InceptionTime(
            num_classes=self.num_classes, train=self.train, dtype=self.dtype,
            name="base"
        )(jnp.transpose(seq, (0, 2, 1)), part=part)
