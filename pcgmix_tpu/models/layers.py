"""Shared building blocks with torch-parity initialization.

The reference initializes every model under ``torch.manual_seed(4)``
(train_model.py:293) with PyTorch default initializers.  Exact bit parity of
init is impossible across RNGs, but *distributional* parity matters for the
0.5-pt accuracy target, so convolutions/linears here use PyTorch's default
scheme: kaiming-uniform(a=√5) weights — i.e. U(-1/√fan_in, 1/√fan_in) — and
U(-1/√fan_in, 1/√fan_in) biases.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_bound(fan_in: int):
    return 1.0 / (fan_in**0.5) if fan_in > 0 else 0.0


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv default: kaiming_uniform(a=√5) == U(±1/√fan_in).

    flax Conv kernel shape is (k..., in_ch, out_ch): fan_in = in_ch * prod(k).
    """
    fan_in = math.prod(shape[:-1])
    b = _uniform_bound(fan_in)
    return jax.random.uniform(key, shape, dtype, -b, b)


def make_torch_bias_init(fan_in: int):
    b = _uniform_bound(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -b, b)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Linear default on a (in, out) kernel."""
    b = _uniform_bound(shape[0])
    return jax.random.uniform(key, shape, dtype, -b, b)


class _MatmulConv1d(nn.Module):
    """nn.Conv-compatible 1-D conv computed as K shifted batched matmuls:

        y[b, t, f] = sum_k  x_pad[b, t*stride + k, c] @ kernel[k, c, f]

    Same params as flax ``nn.Conv`` (kernel ``(K, Cin, Cout)``, bias
    ``(Cout,)``), same numerics up to float reassociation — but the
    contraction is a plain ``dot_general``, so a weight-batched (vmapped)
    call lowers to native batched matmuls on the MXU.  XLA lowers a
    vmapped-conv instead to a block-diagonal grouped convolution, which is
    the measured reason ResNet9 gangs lost to sequential runs (BENCH.md
    gang table, r4).  Instantiated under the name ``Conv_0`` so the param
    tree is byte-identical to the ``nn.Conv`` path (checkpoints/transplants
    work across both impls).

    Chip verdict (r5, artifacts/bench_gang_resnet9_convsweep_r5.json):
    this impl LOSES on TPU v5e — ResNet9 sequential 0.79× the nn.Conv
    path, gangs 0.51-0.67× vs the xla-conv gang's 0.87-0.90×.  The K-step
    shift-and-matmul decomposition re-reads the padded input K times and
    XLA's native conv tiling wins even weight-batched.  Kept as an
    A/B-able negative result (BENCH.md "conv_impl sweep"); do not default
    to it.
    """

    features: int
    kernel_size: int
    stride: int
    pad_lo: int
    pad_hi: int
    use_bias: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (k, x.shape[-1], self.features),
        )
        bias = (
            self.param(
                "bias", make_torch_bias_init(x.shape[-1] * k),
                (self.features,),
            )
            if self.use_bias else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        xp = jnp.pad(x, ((0, 0), (self.pad_lo, self.pad_hi), (0, 0)))
        t_out = (xp.shape[1] - k) // self.stride + 1
        span = (t_out - 1) * self.stride + 1
        y = None
        for i in range(k):
            xi = jax.lax.slice_in_dim(xp, i, i + span, self.stride, axis=1)
            yi = jax.lax.dot_general(
                xi, kernel[i], (((2,), (0,)), ((), ()))
            )
            y = yi if y is None else y + yi
        if bias is not None:
            y = y + bias
        return y


class Conv1d(nn.Module):
    """1-D conv on (B, T, C) with explicit symmetric padding (torch-style).

    ``dtype`` is the computation dtype (params stay float32): bfloat16 runs
    the MXU at full rate on TPU; None keeps float32 for reference parity.

    ``impl`` selects the compute path — same params, same math:
      * ``"xla"`` (default): flax ``nn.Conv`` → XLA convolution;
      * ``"matmul"``: K shifted batched matmuls (``_MatmulConv1d``) — the
        gang-training path for weight-batched (vmapped) models, where XLA's
        grouped-conv lowering of a vmapped conv underuses the MXU.
    """

    features: int
    kernel_size: int
    padding: int | str = "SAME"
    use_bias: bool = True
    stride: int = 1
    dtype: Any = None
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)]
        fan_in = x.shape[-1] * self.kernel_size
        if self.impl == "matmul":
            if pad == "SAME":
                if self.stride != 1:
                    raise ValueError(
                        "impl='matmul' supports 'SAME' padding only at "
                        "stride 1 (strided SAME is input-size-dependent)"
                    )
                # flax/XLA SAME for stride 1: total k-1, split low-heavy
                # torch-style (lo = (k-1)//2, hi = k//2)
                lo, hi = (self.kernel_size - 1) // 2, self.kernel_size // 2
            else:
                (lo, hi), = pad
            return _MatmulConv1d(
                self.features, self.kernel_size, self.stride, lo, hi,
                self.use_bias, self.dtype, name="Conv_0",
            )(x)
        return nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
        )(x)


class Conv2d(nn.Module):
    """2-D conv on (B, H, W, C), torch-default init."""

    features: int
    kernel_size: int
    padding: int | str = "SAME"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        fan_in = x.shape[-1] * self.kernel_size * self.kernel_size
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
        )(x)


class Dense(nn.Module):
    """Linear with torch-default init."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(x.shape[-1]),
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with torch defaults (momentum 0.1 torch == 0.9 ema, eps 1e-5)."""

    use_running_average: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)


def max_pool_1d(x, window: int):
    """torch MaxPool1d(window): stride=window, floor division of length.

    Kept as reduce-window pooling: its select_and_scatter backward is ~9% of
    train-step device time (BENCH.md), but the reshape+axis-max alternative
    measured 20-25% SLOWER end-to-end on TPU — splitting the sublane (T)
    dimension forces relayout copies that cost more than the backward saves.
    """
    t = x.shape[1]
    x = x[:, : (t // window) * window]
    return nn.max_pool(x, (window,), strides=(window,), padding="VALID")


def max_pool_2d(x, window: int):
    h, w = x.shape[1], x.shape[2]
    x = x[:, : (h // window) * window, : (w // window) * window]
    return nn.max_pool(x, (window, window), strides=(window, window), padding="VALID")


def flatten_torch(x):
    """Flatten (B, T, C) → (B, C*T) in torch's channel-major order, so the
    classifier weight layout matches nn.Flatten applied to (B, C, T)."""
    return jnp.transpose(x, (0, 2, 1)).reshape(x.shape[0], -1)


def flatten_torch_2d(x):
    """(B, H, W, C) → (B, C*H*W), torch order."""
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)


class ConvBNAct(nn.Module):
    """tsai-style ConvBlock: Conv(SAME, no bias) → BN → activation
    (the building block of FCN/ResCNN/ResNet, see models.py:591-863)."""

    features: int
    kernel_size: int
    act: Callable | None = nn.relu
    train: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.features, self.kernel_size, "SAME", use_bias=False,
                   dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


def gap_1d(x):
    """Global average pool over time: (B, T, C) → (B, C)."""
    return jnp.mean(x, axis=1)
