"""Calibrate synthetic_effect_dict difficulty for the replication grid.

The replication (scripts/replicate_synthetic.py) needs the vanilla model
BELOW ceiling at the low n_fraction — if vanilla tests at ~100%, no
augmentation can show an effect.  This probe trains vanilla and PCGmix at
n_frac 0.1 for a few (murmur, confounder, noise) triples and reports test
accuracy, so the full grid runs in a regime with headroom (vanilla ~60-85%).

Usage:
    python scripts/calibrate_effect_corpus.py [flags] [murmur,conf,noise]...
Flags:
    --model M        grid model (default resnet9)
    --draws N        number of seed_data subset draws (default 2)
    --band LO,HI     murmur_band override (default 120,180)
    --segs N         segments_per_wav override (default 8) — more cycles per
                     recording keeps the low-n recording diversity fixed while
                     giving the optimizer more steps per epoch, the lever
                     against the never-learn bimodality at n_frac 0.1
    --test-wavs N    num_wavs_test override (default 200) — at 200 test
                     recordings, binomial eval noise alone puts ~±3.5 pt on a
                     paired method delta; 800 halves it
    --spread LO,HI   murmur_amp_spread override (default 0.3,1.7) — the
                     per-recording murmur amplitude range; a narrower spread
                     removes near-invisible-murmur recordings from the tail
    --methods a;b;c  ';'-separated method list
                     (default "base;durratiomixup+1.0")
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcgmix_tpu.data import synthetic_effect_dict
from pcgmix_tpu.train import TrainConfig, train_gang

CORPUS_KW = dict(num_wavs_train=240, num_wavs_test=200,
                 segments_per_wav=8, sig_len=2500)


MODEL = "resnet9"
SEED_DATAS = (1010001, 1010002)
BAND = (120.0, 180.0)
METHODS = ("base", "durratiomixup+1.0")


def probe(murmur, conf, noise, methods=None, seed_datas=None, num_epochs=50):
    ds = synthetic_effect_dict(
        seed=7, murmur_amp=murmur, confounder_amp=conf, noise_amp=noise,
        murmur_band=BAND, **CORPUS_KW)
    accs = {}
    for method in (methods or METHODS):
        cfgs = [
            TrainConfig(
                dataset="PhysioNet", model=MODEL, method=method,
                num_epochs=num_epochs, n_fraction=0.1, seed_data=sd, seed=1,
                compute_dtype="bfloat16", steps_per_dispatch=8,
                loader_parity="numpy", save_artifacts=False, plot=False,
            )
            for sd in (seed_datas or SEED_DATAS)
        ]
        perfs = train_gang(cfgs, ds)
        accs[method] = [p["test_accuracy"][-1] for p in perfs]
        print(f"murmur={murmur} conf={conf} noise={noise} band={BAND} "
              f"{MODEL} {method}: {accs[method]}", flush=True)
    return accs


def main():
    global MODEL, SEED_DATAS, BAND, METHODS
    args = list(sys.argv[1:])
    if "--model" in args:
        i = args.index("--model")
        MODEL = args[i + 1]
        del args[i:i + 2]
    if "--draws" in args:
        i = args.index("--draws")
        SEED_DATAS = tuple(range(1010001, 1010001 + int(args[i + 1])))
        del args[i:i + 2]
    if "--band" in args:
        i = args.index("--band")
        BAND = tuple(float(x) for x in args[i + 1].split(","))
        del args[i:i + 2]
    if "--segs" in args:
        i = args.index("--segs")
        CORPUS_KW["segments_per_wav"] = int(args[i + 1])
        del args[i:i + 2]
    if "--test-wavs" in args:
        i = args.index("--test-wavs")
        CORPUS_KW["num_wavs_test"] = int(args[i + 1])
        del args[i:i + 2]
    if "--spread" in args:
        i = args.index("--spread")
        CORPUS_KW["murmur_amp_spread"] = tuple(
            float(x) for x in args[i + 1].split(","))
        del args[i:i + 2]
    if "--methods" in args:
        i = args.index("--methods")
        METHODS = tuple(args[i + 1].split(";"))
        del args[i:i + 2]
    triples = [tuple(float(x) for x in a.split(",")) for a in args]
    if not triples:
        triples = [(0.15, 1.2, 0.5), (0.12, 1.5, 0.6), (0.2, 1.0, 0.4)]
    for m, c, n in triples:
        probe(m, c, n)


if __name__ == "__main__":
    main()
