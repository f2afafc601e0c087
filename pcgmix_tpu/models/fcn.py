"""FCN time-series classifier (tsai-style).

Parity target: models.py:656-718 (``FCN``, layers [128,256,128], kss
[7,5,3]) and models.py:591-653 (``FCN_custom``, layers [64,128,64]).
Depth protocol: 1..3 after each conv block, 4 after GAP (models.py:670-705).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pcgmix_tpu.models.layers import ConvBNAct, Dense, gap_1d


class FCN(nn.Module):
    num_classes: int = 2
    layers: Sequence[int] = (128, 256, 128)
    kss: Sequence[int] = (7, 5, 3)
    train: bool = True

    def _block(self, i, x):
        return ConvBNAct(
            self.layers[i], self.kss[i], train=self.train, name=f"convblock{i + 1}"
        )(x)

    @nn.compact
    def __call__(self, x, depth: int = 0, part: str | None = None):
        if part == "first":
            if depth == 0:
                return x
            h = jnp.transpose(x, (0, 2, 1))
            for i in range(3):
                h = self._block(i, h)
                if depth == i + 1:
                    return jnp.transpose(h, (0, 2, 1))
            h = gap_1d(h)
            if depth == 4:
                return h
            return Dense(self.num_classes, name="fc")(h)
        if part == "second":
            h = x
            if depth <= 3 and h.ndim == 3:
                h = jnp.transpose(h, (0, 2, 1))
            for i in range(3):
                if depth <= i:
                    h = self._block(i, h)
            if depth <= 3:
                h = gap_1d(h)
            return Dense(self.num_classes, name="fc")(h)
        h = jnp.transpose(x, (0, 2, 1))
        for i in range(3):
            h = self._block(i, h)
        h = gap_1d(h)
        if part == "latent_space":
            return h
        return Dense(self.num_classes, name="fc")(h)
