"""Model factory keyed by the reference's model-name strings.

Parity target: the model-selection ladder in train_model.py:294-386.  The
names used by the published results (resnet9*, Potes*, FCN, ResCNN,
ResNet, Singstad_d*) are implemented natively; the tsai-zoo names the
reference imports from the third-party ``tsai`` package (InceptionTime*,
XceptionTime*, gMLP, XCM*, RNN/LSTM/GRU, mWDN, OmniScaleCNN, XResNet1d18*,
ResNetPlus, FCNPlus — train_model.py:306-384) are reimplementations of the
published tsai 0.3.x architectures (tsai is not in this image; disclosed
per-module, no bit-parity oracle).  'Plus' variants differ in tsai only by
block-plumbing conveniences with identical defaults and map to the same
class here; tsai's ResNetPlus/FCNPlus are architecturally this repo's
ResNet/FCN.
"""

from __future__ import annotations

from typing import Any

from pcgmix_tpu.models.fcn import FCN
from pcgmix_tpu.models.potes import POTES_PRESETS, PotesCNN
from pcgmix_tpu.models.rescnn import ResCNN
from pcgmix_tpu.models.resnet9 import RESNET9_PRESETS, ResNet9_1D
from pcgmix_tpu.models.resnet9_2d import ResNet9_2D
from pcgmix_tpu.models.resnet_ts import ResNetTS
from pcgmix_tpu.models.singstad import SingstadInceptionTime
from pcgmix_tpu.models.tsai_inception import InceptionTime, XceptionTime
from pcgmix_tpu.models.tsai_misc import MWDN, OmniScaleCNN, XCM
from pcgmix_tpu.models.tsai_seq import GMLP, TsaiRNN
from pcgmix_tpu.models.tsai_xresnet import XResNet1d18

_TSAI_NAMES = (
    "ResNetPlus",
    "XResNet1d18",
    "XResNet1d18Plus",
    "InceptionTime",
    "InceptionTimePlus",
    "XceptionTime",
    "XceptionTimePlus",
    "gMLP",
    "XCM",
    "XCMPlus",
    "FCNPlus",
    "RNN",
    "LSTM",
    "GRU",
    "mWDN",
    "OmniScaleCNN",
)

MODEL_NAMES = (
    list(RESNET9_PRESETS)
    + list(POTES_PRESETS)
    + ["FCN", "FCN(custom)", "ResCNN", "ResNet", "Singstad_d3", "Singstad_d6", "Singstad_d10"]
    + list(_TSAI_NAMES)
)

#: mel-image side length per 2-D dataset name (the datasets the reference's
#: 2-D loaders build: dataloader_physionet2d/dataloader_umc2d)
SPEC_DATASET_SIZES = {
    "PhysioNet(spec128)": 128,
    "UMC(spec128)": 128,
    "UMC(spec64)": 64,
}


def sample_input_shape(
    dataset: str, num_channels: int, sig_len: int
) -> tuple[int, ...]:
    """Canonical batch-1 model input shape for a config.  2-D mel datasets
    take (1, 1, S, S) images with S from the DATASET name — ``sig_len`` is
    the 1-D cycle length (2500), never the mel size; 1-D takes (1, C, L)."""
    if dataset in SPEC_DATASET_SIZES:
        s = SPEC_DATASET_SIZES[dataset]
        return (1, 1, s, s)
    return (1, num_channels, sig_len)


def build_model(
    name: str,
    dataset: str = "PhysioNet",
    num_classes: int = 2,
    train: bool = True,
    compute_dtype: Any = None,
    conv_impl: str = "xla",
) -> Any:
    """Instantiate a model by its reference name (train_model.py:294-386).

    ``dataset`` selects 2-D variants for spectrogram datasets and adjusts
    nothing else — classifier sizes are shape-inferred.  ``compute_dtype``
    (e.g. jnp.bfloat16) switches the compute path off float32 — a TPU
    throughput mode, off by default for reference parity.  Families that
    honor it: ResNet9 (1-D/2-D), Potes, InceptionTime(Plus),
    XceptionTime(Plus), XResNet1d18(Plus), gMLP, XCM(Plus), mWDN,
    OmniScaleCNN.  Families that ignore it (always fp32): FCN(Plus),
    ResCNN, ResNet(Plus), Singstad_d*, RNN/LSTM/GRU — small or
    scan-sequential nets where bf16 buys nothing (BENCH.md zoo rows).

    ``conv_impl="matmul"`` switches 1-D convolutions to the shifted-
    dot_general path (same param tree, float-reassociation-level numerics)
    — the weight-batched gang fast path; honored by the ResNet9 1-D
    presets and Potes, ignored elsewhere.
    """
    if dataset in ("PhysioNet(spec128)", "UMC(spec128)", "UMC(spec64)"):
        if name == "resnet9":
            return ResNet9_2D(num_classes=num_classes, train=train, dtype=compute_dtype)
        raise ValueError(f"2-D dataset {dataset!r} supports model 'resnet9' only")
    if name in RESNET9_PRESETS:
        return ResNet9_1D(
            num_classes=num_classes, filters=RESNET9_PRESETS[name], train=train,
            dtype=compute_dtype, conv_impl=conv_impl,
        )
    if name in POTES_PRESETS:
        return PotesCNN(num_classes=num_classes, train=train, dtype=compute_dtype,
                        conv_impl=conv_impl, **POTES_PRESETS[name])
    if name == "FCN":
        return FCN(num_classes=num_classes, train=train)
    if name == "FCN(custom)":
        return FCN(num_classes=num_classes, layers=(64, 128, 64), train=train)
    if name == "ResCNN":
        return ResCNN(num_classes=num_classes, train=train)
    if name == "ResNet":
        return ResNetTS(num_classes=num_classes, train=train)
    if name.startswith("Singstad_d"):
        return SingstadInceptionTime(
            num_classes=num_classes, depth_variant=int(name.split("_d")[1]), train=train
        )
    if name in ("InceptionTime", "InceptionTimePlus"):
        return InceptionTime(num_classes=num_classes, train=train,
                             dtype=compute_dtype)
    if name in ("XceptionTime", "XceptionTimePlus"):
        return XceptionTime(num_classes=num_classes, train=train,
                            dtype=compute_dtype)
    if name in ("XResNet1d18", "XResNet1d18Plus"):
        return XResNet1d18(num_classes=num_classes, train=train,
                           dtype=compute_dtype)
    if name == "ResNetPlus":
        # tsai ResNetPlus == the ResNet trunk (nf 64/128/128, ks [7,5,3])
        # with an identical default head
        return ResNetTS(num_classes=num_classes, train=train)
    if name == "FCNPlus":
        # tsai FCNPlus == FCN (layers [128,256,128], kss [7,5,3])
        return FCN(num_classes=num_classes, train=train)
    if name in ("RNN", "LSTM", "GRU"):
        # sequential time scan — fp32 throughout (no MXU-bound matmuls
        # big enough for a bf16 win)
        return TsaiRNN(num_classes=num_classes, cell_type=name.lower(), train=train)
    if name == "gMLP":
        return GMLP(num_classes=num_classes, train=train, dtype=compute_dtype)
    if name in ("XCM", "XCMPlus"):
        return XCM(num_classes=num_classes, train=train, dtype=compute_dtype)
    if name == "mWDN":
        return MWDN(num_classes=num_classes, train=train, dtype=compute_dtype)
    if name == "OmniScaleCNN":
        return OmniScaleCNN(num_classes=num_classes, train=train,
                            dtype=compute_dtype)
    raise ValueError(f"unknown model {name!r}; available: {', '.join(MODEL_NAMES)}")


def count_parameters(params) -> int:
    """Trainable-parameter count of a params pytree.

    Parity: count_model_parameters (train_model.py:162-163), printed at
    train start (:387).  Pass only the ``params`` collection — torch's
    ``requires_grad`` filter excludes BN running stats, which live in
    ``batch_stats`` here."""
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def max_latent_depth(name: str) -> int:
    """Max depth for latentmixup's random depth draw (augmentations.py:1484-1494).

    Raises for models without a part='first'/'second' split forward — the
    reference crashes for those too (its latentmixup ladder only assigns
    max_model_depth for resnet9/Potes/Singstad, and the d3/d6 Singstad
    forwards have their pass_part branches commented out)."""
    if name in ("FCN", "FCN(custom)"):
        return 4  # args.depth = 4 then overwritten by randint(1, max)
    if name.startswith("Potes"):
        return 1
    if name == "ResCNN":
        return 5
    if name in RESNET9_PRESETS or name == "resnet9":
        return 3
    if name == "Singstad_d10":
        return 3
    raise NotImplementedError(
        f"latentmixup needs a split (part='first'/'second') forward, which "
        f"{name!r} does not implement (nor does the reference's); supported: "
        "resnet9 presets, Potes presets, FCN(+custom), ResCNN, Singstad_d10"
    )
