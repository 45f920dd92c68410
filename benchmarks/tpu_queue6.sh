#!/bin/bash
# Round-3 (third session) on-chip decision queue: the compositional
# remat policy. queue5 established (a) encoder remat wins batch 2
# (479.2 vs 486.7 ms), (b) batch 4/8 OOM even with encoder remat,
# (c) the backward's dominant HBM writer is future_prediction
# (16.0 GB bwd + 11.9 GB fwd materialized writes — the unrolled GRU
# rollouts store every per-step gate for the backward).
#
# Open questions:
#  q1  does rematting the future stage cut the batch-2 train step?
#      (trades ~10 ms of rollout recompute against ~12 GB of stored
#      gate traffic — the roofline says traffic is the binding resource)
#  q2  does the full policy fit batch 4, and at what samples/s?
#      (fits == beats 2x-DP only if < 2x the batch-2 latency)
#  q3  if q2 fits: batch 8.
# Verdict procedure: a policy ships as the train-YAML default only if
# it beats 'encoder' on samples/s; OOMs and losses get recorded as
# negative results in benchmarks/README.md.
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue6

run() { name=$1; shift; echo "== $name: $*"; "$@" 2>&1 | tail -40 | tee /tmp/tpu_queue6/$name.log; }

run q1_b2_encfut    env REMAT=encoder+future python benchmarks/train_bench.py 2
run q2_b4_full      env REMAT=encoder+temporal+future+decoder python benchmarks/train_bench.py 4
run q3_b8_full      env REMAT=encoder+temporal+future+decoder python benchmarks/train_bench.py 8
