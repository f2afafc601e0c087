#!/bin/sh
# The paper's ablation/sensitivity studies (experiments_timeseries.ipynb
# cells 13/15/17/19), each at the notebook's final n_fraction selection.
# Apply-probabilities follow the notebook's per-n_fraction choices, which
# equal the robust '+cp' table — these studies pass them explicitly, so the
# runner gets --no-robust plus the literal '+p' strings.
#
# DAG edges resolve automatically:
#   (closestknn…)  → trains the canonical frozen ResCNN latent run first
#                    (latent_space.py:27-29; notebook cell 13)
#   (salopt…)      → trains the pretrained saliency run first
#                    (saliency.py:26-37; notebook cell 17)
set -e
DAT=${1:?usage: study_grids.sh physionet.dat}
COMMON="--dataset-file $DAT --model resnet9 --num-epochs 50 --batch-size 64
        --no-robust --compute-dtype bfloat16 --steps-per-dispatch 8"

# Out-of-manifold intrusion: kNN-constrained mixing (cell 13, n_frac=0.1)
# shellcheck disable=SC2086
pcgmix-run $COMMON --n-fractions 0.1 --seeds 1 --methods \
  "(closestknn=4)durmixmagwarp(0.2,4)+1.0" \
  "(closestknn=8)durmixmagwarp(0.2,4)+1.0" \
  "(closestknn=16)durmixmagwarp(0.2,4)+1.0" \
  "(closestknn=26)durmixmagwarp(0.2,4)+1.0" \
  "(closestknn=64)durmixmagwarp(0.2,4)+1.0"

# Mapping functions for mixing pairs (cell 15, all n_fractions; probas
# follow the robust table per n_fraction)
for nf_p in "0.015 1.0" "0.052 1.0" "0.1 1.0" "0.2 0.8" "0.3 0.6" \
            "0.4 0.6" "0.6 0.4" "0.8 0.2"; do
  nf=${nf_p% *}; p=${nf_p#* }
  # shellcheck disable=SC2086
  pcgmix-run $COMMON --n-fractions "$nf" --seeds 1 --methods \
    "(samePCG)durmixmagwarp(0.2,4)+$p" \
    "(sameCVD)durmixmagwarp(0.2,4)+$p" \
    "(sameDataset)durmixmagwarp(0.2,4)+$p" \
    "(mixAll)durmixmagwarp(0.2,4)+$p" \
    --cvd-map-csv cvds_map.csv
done
# shellcheck disable=SC2086
pcgmix-run $COMMON --n-fractions 1.0 --seeds 1 2 3 4 5 --methods \
  "(samePCG)durmixmagwarp(0.2,4)+0.2" \
  "(sameCVD)durmixmagwarp(0.2,4)+0.2" \
  "(sameDataset)durmixmagwarp(0.2,4)+0.2" \
  "(mixAll)durmixmagwarp(0.2,4)+0.2" \
  --cvd-map-csv cvds_map.csv

# Saliency utilization (cell 17, n_frac=0.1): random vs saliency-optimal
# displacement, env/sum objectives, -1/-2 pretrained-model variants
# shellcheck disable=SC2086
pcgmix-run $COMMON --n-fractions 0.1 --seeds 1 --methods \
  "(rand)durratiomixup+1.0" \
  "(rand)durmixmagwarp(0.2,4)+1.0" \
  "(saloptsum)durratiomixup+1.0" \
  "(saloptsum)durmixmagwarp(0.2,4)+1.0" \
  "(saloptenv)durratiomixup+1.0" \
  "(saloptenv)durmixmagwarp(0.2,4)+1.0" \
  "(saloptenv-1)durratiomixup+1.0" \
  "(saloptenv-2)durmixmagwarp(0.2,4)+1.0"

# Beta-distribution alpha sensitivity (cell 19, n_frac=0.1)
ALPHAS="0.05 0.25 0.5 0.75 1.25 1.5 1.75 2 3 4 5 6 7 8 9 10"
for a in $ALPHAS; do
  # shellcheck disable=SC2086
  pcgmix-run $COMMON --n-fractions 0.1 --seeds 1 --methods \
    "(alpha=$a)durmixmagwarp(0.2,4)+1.0"
done

# Train-balance seed sensitivity (cell 11, n_frac=1.0)
for ts in 19 20 21 22 23; do
  # shellcheck disable=SC2086
  pcgmix-run $COMMON --n-fractions 1.0 --seeds 1 2 3 4 5 --methods \
    "base-trueseed=$ts"
done
