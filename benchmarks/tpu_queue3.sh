#!/bin/bash
# Pruned remainder after the on-chip A/B round: the fused SpatialGRU
# rollout kernel VMEM-OOMs at flagship scale on v5e (143.65M of 128M,
# see benchmarks/README.md), so every STP3_SPATIAL_GRU=pallas step is
# dropped. Remaining decisions: train backward (STP3_SPLAT_BWD=pallas)
# and informational breakdowns.
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

run train_base python benchmarks/train_bench.py 2
run train_gbwd env STP3_SPLAT_BWD=pallas python benchmarks/train_bench.py 2
run fwd_bd python benchmarks/forward_breakdown.py
run future_bd python benchmarks/future_breakdown.py
run bevpool python benchmarks/bev_pool_bench.py
run train_hlo python benchmarks/train_hlo_traffic.py
run hlo python benchmarks/hlo_traffic.py
