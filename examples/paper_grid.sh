#!/bin/sh
# The paper's headline PhysioNet time-series grid (BASELINE.md tables),
# production fast config.  Robust '+cp' schedules are applied automatically;
# finished runs are skipped on re-run; read the tables with pcgmix-results.
#
# Method list: experiments_timeseries.ipynb cell 9's aug_methods, with the
# notebook's missing comma fixed — the committed list concatenates
# 'respiratoryscale(12,20)' and 'durratiomixup' into one string (see
# PARITY.md) — mapping to the paper rows NoiseInject, TimeMask, (TimeWarp),
# MagWarp, ManifoldMixup, Mixup, RespScale, PCGmix, PCGmix+.
#
# Seed protocol (read_experiments.py:20-59): n_fractions below 1.0 average
# over their seed_data grids with test seed 1 only; n_fraction 1.0 uses one
# seed_data with test seeds 1-5.
set -e
DAT=${1:?usage: paper_grid.sh physionet.dat}

METHODS='base
gaussiannoise(25,40)
timemask(0.2)
timewarp(0.05,4)
magnitudewarp(0.2,4)
latentmixup
mixup(same)
respiratoryscale(12,20)
durratiomixup
durmixmagwarp(0.2,4)'

# shellcheck disable=SC2086
set -- $METHODS

# --gang trains each n_fraction's ~10-member seed_data grid as ONE vmapped
# program (equal-sized subsets group automatically; odd sizes fall back)
pcgmix-run --dataset-file "$DAT" --model resnet9 \
  --methods "$@" \
  --n-fractions 0.015 0.052 0.1 0.2 0.3 0.4 0.6 0.8 \
  --seeds 1 \
  --num-epochs 50 --batch-size 64 \
  --compute-dtype bfloat16 --steps-per-dispatch 8 --gang

pcgmix-run --dataset-file "$DAT" --model resnet9 \
  --methods "$@" \
  --n-fractions 1.0 \
  --seeds 1 2 3 4 5 \
  --num-epochs 50 --batch-size 64 \
  --compute-dtype bfloat16 --steps-per-dispatch 8 --gang

pcgmix-results --model resnet9 \
  --methods "$@" \
  --n-fractions 0.015 0.052 0.1 0.2 0.3 0.4 0.6 0.8 1.0 \
  --metric Accuracy
