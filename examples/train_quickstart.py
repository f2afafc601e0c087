"""Quickstart: train PCGmix+ on a packed dataset and read the results.

With a reference-built dataset (zbytes_physionet_dataset.dat loads as-is):

    python examples/train_quickstart.py path/to/physionet.dat

Without one, run it with no arguments to use a synthetic fixture.
"""

import sys

from pcgmix_tpu import utils
from pcgmix_tpu.train import TrainConfig, train_model


def main():
    if len(sys.argv) > 1:
        dataset = utils.file2dict(sys.argv[1])
        cfg = TrainConfig(
            model="resnet9",
            method="durmixmagwarp(0.2,4)+0.8",  # PCGmix+ w/ apply-prob 0.8
            n_fraction=0.1,
            seed_data=1010001,
        )
    else:
        from pcgmix_tpu.data import synthetic_physionet_dict

        dataset = synthetic_physionet_dict(
            num_wavs_train=24, num_wavs_test=8, segments_per_wav=2,
            sig_len=512, seed=1,
        )
        cfg = TrainConfig(
            model="resnet9-5k", method="durmixmagwarp(0.2,4)+0.8",
            num_epochs=5, batch_size=8, sig_len=512, save_artifacts=False,
            loader_parity="numpy",
        )
    perf = train_model(cfg, dataset, progress=True)
    print("final test accuracy:", perf["test_accuracy"][-1])


if __name__ == "__main__":
    main()
