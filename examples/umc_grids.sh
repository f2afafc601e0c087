#!/bin/sh
# The UMC (chronic-heart-failure) experiment grids.  seed_data indexes the
# ten hardcoded held-out patient folds (dataloader_umc.py:61-83), so every
# grid loops --seed-datas 1..10 with --seeds 1.
#
# 1-D: experiments_timeseries.ipynb cell 24 (base hyperparameter sweep) and
# cell 26 (classical-feature extraction under (samePCG) PCGmix/PCGmix+).
# 2-D: experiments_spectrograms.ipynb cells 16/18 (base + durratio methods).
set -e
DAT1D=${1:?usage: umc_grids.sh umc.dat [umc_spec64.dat]}
DAT2D=${2:-}
FOLDS="1 2 3 4 5 6 7 8 9 10"

# cell 24: base sweep over lr x epochs x batch size across the ten folds
for bs in 128 64 32; do
  for ep in 50 25 10; do
    for lr in 0.01 0.001; do
      # shellcheck disable=SC2086
      # --gang: the ten folds have unequal train sizes and per-fold test
      # sets, which the ragged gang path trains as ONE vmapped program
      pcgmix-run --dataset-file "$DAT1D" --dataset UMC --model resnet9 \
        --sig-len 2000 --methods base --n-fractions 1.0 \
        --seeds 1 --seed-datas $FOLDS \
        --num-epochs "$ep" --batch-size "$bs" --lr-max "$lr" \
        --no-robust --steps-per-dispatch 8 --gang
    done
  done
done

# cell 26: train with (samePCG) mixes and dump classical features per epoch
# shellcheck disable=SC2086
pcgmix-run --dataset-file "$DAT1D" --dataset UMC --model resnet9 \
  --sig-len 2000 --classical-space \
  --methods base "(samePCG)durratiomixup+1.0" \
    "(samePCG)durmixmagwarp(0.2,4)+1.0" \
  --n-fractions 1.0 --seeds 1 --seed-datas $FOLDS \
  --num-epochs 50 --batch-size 512 --no-robust

# cells 16/18 (2-D): base + the cell-18 method list on 64x64 spectrograms.
# NOTE the second cell-18 arm is 'durmixmagwarp(0.2,4)+1.0', which no 2-D
# dispatch branch matches — the methods_implemented guard
# (augmentations2d.py:283) runs it as IDENTITY, i.e. a base run whose dir
# is labeled durmixmagwarp; our parser reproduces that exactly.
if [ -n "$DAT2D" ]; then
  # shellcheck disable=SC2086
  pcgmix-run --dataset-file "$DAT2D" --dataset "UMC(spec64)" \
    --model resnet9 --num-channels 1 \
    --methods base "durratiomixup+1.0" "durmixmagwarp(0.2,4)+1.0" \
    --n-fractions 1.0 --seeds 1 --seed-datas $FOLDS \
    --num-epochs 50 --batch-size 64 --no-robust --steps-per-dispatch 8 --gang
fi
