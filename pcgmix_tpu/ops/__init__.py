"""Low-level device kernels (JAX/XLA, with Pallas fast paths).

Everything in here is a pure, statically-shaped function designed to live
inside a single jitted train step: segment surgery is expressed as masked
gathers over the fixed signal axis instead of the reference's per-sample
Python slice loops (augmentations.py:289-366, :970-977).
"""

from pcgmix_tpu.ops.piecewise import (
    piecewise_mix,
    piecewise_mix_batch,
    piecewise_mix_pairs,
    segment_blend_pieces,
)
from pcgmix_tpu.ops.spline import (
    cubic_spline_basis,
    magnitude_warp,
    time_warp,
)
from pcgmix_tpu.ops.masks import (
    interval_mask,
    time_mask,
    s1s2_mask,
    zero_after,
)

__all__ = [
    "piecewise_mix",
    "piecewise_mix_batch",
    "piecewise_mix_pairs",
    "segment_blend_pieces",
    "cubic_spline_basis",
    "magnitude_warp",
    "time_warp",
    "interval_mask",
    "time_mask",
    "s1s2_mask",
    "zero_after",
]
