#!/usr/bin/env bash
# NYUv2 MTL training (reference scripts/train_nyu.sh:8-14:
# basic, 50 epochs, bs 4)
set -e
cd "$(dirname "$0")/.."

python -m vision_mtl_tpu.training \
    --model_name basic \
    --dataset_name nyuv2 \
    --num_epochs 50 \
    --batch_size 4 \
    --val_epoch_freq 1 \
    --save_epoch_freq 10 \
    "$@"
