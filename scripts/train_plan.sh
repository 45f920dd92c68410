#!/bin/bash
# Stage 3: planning, warm-started from stage 2 minus decoder heads
# usage: ./scripts/train_plan.sh <config> <dataroot> <pretrained_ckpt>
python train.py --config-file "${1:-stp3_tpu/configs/nuscenes/Planning.yml}" \
    DATASET.DATAROOT "${2:-/data/nuscenes}" DATASET.MAP_FOLDER "${2:-/data/nuscenes}" \
    PRETRAINED.LOAD_WEIGHTS True PRETRAINED.PATH "$3"
