"""pcgmix_tpu — a TPU-native (JAX/XLA/Pallas) framework for heart-sound
classification with cardiac-cycle-aware data augmentation.

This package is a ground-up TPU rebuild of the capabilities of
`PCGmix-A-Data-Augmentation-Method-for-Heart-Sound-Classification-EXTENDED`
(IEEE JBHI 2024, extended).  It is NOT a port: the reference runs per-sample
Python loops over GPU tensors inside the training step; here every
augmentation is a vmapped, statically-shaped masked-gather kernel that runs
on device inside a single jitted train step, while the (tiny) RNG/pairing
decisions are made on host with bit-exact reference semantics.

Subsystems (see SURVEY.md §2 for the reference inventory they mirror):

- :mod:`pcgmix_tpu.ops`       low-level device kernels (piecewise mix, spline
                              warps, filtering, spectrograms, masks)
- :mod:`pcgmix_tpu.augment`   the method-string DSL engine (plan on host,
                              apply on device)
- :mod:`pcgmix_tpu.models`    flax model zoo (ResNet9 1D/2D, Potes CNN, FCN,
                              ResCNN, ResNet, Singstad InceptionTime)
- :mod:`pcgmix_tpu.train`     jitted training/eval runtime, losses, OneCycle
- :mod:`pcgmix_tpu.data`      dataset assembly, split logic, loaders, builder
- :mod:`pcgmix_tpu.saliency`  input-gradient saliency subsystem
- :mod:`pcgmix_tpu.latent`    latent-space feature extraction
- :mod:`pcgmix_tpu.classical` classical-ML feature pipeline
- :mod:`pcgmix_tpu.exp`       experiment naming/results/reporting
- :mod:`pcgmix_tpu.parallel`  device-mesh data parallelism
"""

__version__ = "0.1.0"


def __getattr__(name):
    # convenience top-level re-exports without import-time jax cost
    if name in ("TrainConfig", "train_model"):
        from pcgmix_tpu.train import TrainConfig, train_model

        return {"TrainConfig": TrainConfig, "train_model": train_model}[name]
    if name == "AugmentEngine":
        from pcgmix_tpu.augment import AugmentEngine

        return AugmentEngine
    raise AttributeError(name)
