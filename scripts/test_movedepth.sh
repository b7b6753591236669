#!/usr/bin/env bash
# Launch parity with the reference's test_movedepth.sh.
# Usage: scripts/test_movedepth.sh EXP MODEL SPLITS_DIR [extra args]
set -e
DATA_PATH=${DATA_PATH:-/data/kitti_raw}
exp=$1; model_name=$2; SPLITS=$3; shift 3
EXP_DIR=log/$exp
python -m movedepth_tpu.cli.evaluate \
    --data_path "$DATA_PATH" \
    --dataset kitti \
    --load_weights_folder "$EXP_DIR/$model_name/models/last" \
    --splits_dir "$SPLITS" \
    --png \
    --height 192 --width 640 \
    --prior_scale 2 \
    --batch_size 1 \
    --eval_split eigen \
    --convex_up \
    "$@" | tee -a "$EXP_DIR/$model_name/log_test.txt"
