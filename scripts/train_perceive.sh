#!/bin/bash
# Stage 1: perception (reference scripts/train_perceive.sh)
# usage: ./scripts/train_perceive.sh <config> <dataroot>
python train.py --config-file "${1:-stp3_tpu/configs/nuscenes/Perception.yml}" \
    DATASET.DATAROOT "${2:-/data/nuscenes}" DATASET.MAP_FOLDER "${2:-/data/nuscenes}"
