#!/bin/bash
# Open-loop evaluation (reference scripts/eval_plan.sh)
# usage: ./scripts/eval_plan.sh <checkpoint> <dataroot>
python evaluate.py --checkpoint "$1" --dataroot "$2"
