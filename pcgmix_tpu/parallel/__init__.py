"""Device-mesh parallelism (SURVEY.md §5).

The reference's only multi-device construct is nn.DataParallel
(train_model.py:385) — single-process replica scatter/gather.  The TPU-native
equivalent is SPMD batch-dimension data parallelism over a
``jax.sharding.Mesh``: parameters/optimizer state replicated, batches (and
per-sample plan arrays) sharded on the 'data' axis, gradients combined by
XLA-inserted collectives over ICI.  No TP/PP/SP is defined because the
models are ≤9M parameters with no attention (SURVEY.md §2, §5) — sharding
them would only add latency.
"""

from pcgmix_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_dp_train_step,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "make_dp_train_step"]
