#!/usr/bin/env bash
# Cityscapes MTL training (reference scripts/train_cityscapes.sh:8-15:
# mtan, 20 epochs, bs 8, lr 5e-4)
set -e
cd "$(dirname "$0")/.."

python -m vision_mtl_tpu.training \
    --model_name mtan \
    --dataset_name cityscapes \
    --num_epochs 20 \
    --batch_size 8 \
    --lr 5e-4 \
    --val_epoch_freq 1 \
    --save_epoch_freq 5 \
    "$@"
