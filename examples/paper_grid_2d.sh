#!/bin/sh
# The paper's PhysioNet SPECTROGRAM grid (experiments_spectrograms.ipynb
# cell 11): the published 2-D method ladder at the notebook's n_fraction
# slice (0.1 with one seed_data; the full per-nfrac seed_data grids live in
# exp/robust.SEED_DATA_GRIDS and engage automatically when --seed-datas is
# omitted).  salopt methods pre-train their dependency checkpoint first
# (the runner's DAG).  Robust '+cp' schedules apply automatically; finished
# runs are skipped on re-run.
set -e
DAT=${1:?usage: paper_grid_2d.sh physionet_spec128.dat}

pcgmix-run --dataset-file "$DAT" --dataset "PhysioNet(spec128)" \
  --model resnet9 --num-channels 1 \
  --methods durratiocutmix "mixup(same)" durratiomixup cutmix \
    "freqmask(0.1)" "timemask(0.1)" "cutout(0.25,0.25)" latentmixup \
    "durmixfreqmask(0.1)" "durmixtimemask(0.1)" "durmixcutout(0.25,0.25)" \
    "(saloptsum)durratiomixup" "(saloptenv)durratiomixup" \
    "(saloptsum-1)durratiomixup" "(saloptenv-1)durratiomixup" \
  --n-fractions 0.1 \
  --seeds 1 \
  --num-epochs 50 --batch-size 64 \
  --steps-per-dispatch 8 --gang

pcgmix-results --dataset "PhysioNet(spec128)" --model resnet9 \
  --num-channels 1 \
  --methods durratiomixup durratiocutmix cutmix latentmixup \
  --n-fractions 0.1 --num-epochs 50 --batch-size 64 --metric Accuracy
