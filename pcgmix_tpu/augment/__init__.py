"""The augmentation engine: method-string DSL → host plan → device apply.

Architecture (contrast with the reference's augment() dispatcher,
augmentations.py:698-1633, which loops per sample on the accelerator):

1. :mod:`pcgmix_tpu.augment.methods` parses the method-string DSL
   (SURVEY.md §2.3) into a typed :class:`MethodSpec` with the same substring
   priority ladder as the reference dispatcher.
2. :mod:`pcgmix_tpu.augment.plan` builds, per step, a tiny pytree of arrays
   (pair indices, λ, displacements, mask bounds, spline knots) on the host —
   reproducing the reference's step-seeded RNG protocol bit-exactly.
3. :mod:`pcgmix_tpu.augment.engine` applies the plan to the on-device batch
   as one statically-shaped jitted transform (vmapped piecewise mix +
   matmul spline warps + vectorized masks) fused into the train step.
"""

from pcgmix_tpu.augment.methods import MethodSpec, parse_method
from pcgmix_tpu.augment.engine import AugmentEngine

__all__ = ["MethodSpec", "parse_method", "AugmentEngine"]
