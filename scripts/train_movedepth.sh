#!/usr/bin/env bash
# Launch parity with the reference's train_movedepth.sh (no
# torch.distributed.launch needed -- all local devices join the data mesh).
# Usage: scripts/train_movedepth.sh EXP MODEL BATCH [extra args]
set -e
DATA_PATH=${DATA_PATH:-/data/kitti_raw}
exp=$1; model_name=$2; BS=$3; shift 3
EXP_DIR=log/$exp
mkdir -p "$EXP_DIR/$model_name"
python -m movedepth_tpu.cli.train \
    --dataset kitti \
    --data_path "$DATA_PATH" \
    --log_dir "$EXP_DIR" \
    --model_name "$model_name" \
    --split eigen_zhou \
    --height 192 --width 640 \
    --prior_scale 2 \
    --png \
    --batch_size "$BS" \
    --convex_up \
    --learning_rate 2e-4 \
    "$@" | tee -a "$EXP_DIR/$model_name/log_train.txt"
