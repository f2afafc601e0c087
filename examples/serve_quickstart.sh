#!/bin/sh
# Serve a trained checkpoint: per-recording decisions over a dataset split.
set -e
CKPT=${1:?usage: serve_quickstart.sh model.msgpack physionet.dat}
DAT=${2:?usage: serve_quickstart.sh model.msgpack physionet.dat}
pcgmix-serve --checkpoint "$CKPT" --model resnet9 --dataset-file "$DAT" --split test
