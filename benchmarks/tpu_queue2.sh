#!/bin/bash
# Reprioritized remainder of tpu_queue.sh: decision-driving A/Bs first
# (fused-GRU e2e benches, train-step A/Bs, pallas2b throughput), the
# informational breakdowns last. Same log dir / decision procedure as
# tpu_queue.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue

run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue/queue.log
  timeout 1800 "$@" >/tmp/tpu_queue/$name.log 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue/queue.log
  tail -5 /tmp/tpu_queue/$name.log
}

# decision: pallas2b at batch 8
run tput8_p2b env STP3_SPLAT_METHOD=pallas2b python benchmarks/throughput_bench.py 8

# decisions: fused GRU rollouts e2e
run bench_sgru env STP3_SPATIAL_GRU=pallas python bench.py
run bench_dgru env STP3_DUAL_GRU=pallas python bench.py
run bench_bothgru env STP3_SPATIAL_GRU=pallas STP3_DUAL_GRU=pallas python bench.py

# decisions: train-step A/Bs (batch 2)
run train_base python benchmarks/train_bench.py 2
run train_gbwd env STP3_SPLAT_BWD=pallas python benchmarks/train_bench.py 2
run train_sgru env STP3_SPATIAL_GRU=pallas python benchmarks/train_bench.py 2

# serving with winning GRUs (informational until the flips are decided)
run serve_bothgru env STP3_SPATIAL_GRU=pallas STP3_DUAL_GRU=pallas python benchmarks/serving_bench.py

# informational
run sgru python benchmarks/spatial_gru_bench.py
run dgru python benchmarks/dual_gru_bench.py
run bevpool python benchmarks/bev_pool_bench.py
run future_bd python benchmarks/future_breakdown.py
run fwd_bd python benchmarks/forward_breakdown.py
run train_hlo python benchmarks/train_hlo_traffic.py
run hlo python benchmarks/hlo_traffic.py
