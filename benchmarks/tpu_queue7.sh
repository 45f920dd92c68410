#!/bin/bash
# Round-3 (fourth session) on-chip decision queue: per-GRU-cell remat.
# queue6 showed rematting the WHOLE future stage loses (549.9 vs
# 479.2 ms @ b2): its backward re-runs the serial rollout. The 'cells'
# tag (layers/temporal.py SpatialGRU/DualGRU remat_cells) checkpoints
# each cell call instead: backward recomputes only the gate convs of
# that step from the saved (x_t, h_{t-1}) — step-local, no serial
# recompute — against ~the stored-gate share of future_prediction's
# 28 GB fwd+bwd traffic.
#
#  q1  batch-2 train step, REMAT=encoder (the current default; fresh
#      control row for today's chip weather)
#  q2  batch-2 train step, REMAT=encoder+cells
#  q3  if q2 wins: does encoder+cells fit batch 4?
# Verdict procedure: 'encoder+cells' replaces 'encoder' in the train
# YAMLs only if q2 beats q1 on samples/s; a loss is recorded as a
# negative result in benchmarks/README.md with the measured numbers.
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue7

run() { name=$1; shift; echo "== $name: $*"; "$@" 2>&1 | tail -40 | tee /tmp/tpu_queue7/$name.log; }

run q1_b2_encoder   env REMAT=encoder python benchmarks/train_bench.py 2
run q2_b2_enccells  env REMAT=encoder+cells python benchmarks/train_bench.py 2
run q3_b4_enccells  env REMAT=encoder+cells python benchmarks/train_bench.py 4
