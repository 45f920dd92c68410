#!/bin/bash
# Round-2 TPU A/B queue — run once the tunneled chip is back up.
# Each step logs to /tmp/tpu_queue/<name>.log; safe to re-run (compiles
# are persistently cached). Review the logs before changing any default.
#
# DECISION PROCEDURE once the logs exist (vs bench_base, noise ~±0.5 ms):
#   bench_sgru wins  -> flip _FUSED_GRU_AUTO['STP3_SPATIAL_GRU']
#                       (stp3_tpu/layers/temporal.py)
#   bench_dgru wins  -> flip _FUSED_GRU_AUTO['STP3_DUAL_GRU']
#   bench_p2b wins   -> ops/bev_pool.py method='auto' picks 'pallas2b'
#                       on a single TPU (today: 'pallas2')
#   train_gbwd wins  -> auto-route _bwd_v2 (ops/pallas/bev_pool_kernel.py)
#                       through gather_rows_pallas on single-TPU
#   then: rerun bench.py 3x (median), fast test suite, refresh the
#   numbers in CLAUDE.md / README.md / benchmarks/README.md, commit.
# If a pallas GRU kernel FAILS to compile on the chip (Mosaic), the
# likely culprit is the unaligned-sublane tap slices; record the error
# verbatim in benchmarks/README.md before attempting fixes.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue

run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue/queue.log
  timeout 1800 "$@" >/tmp/tpu_queue/$name.log 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue/queue.log
  tail -15 /tmp/tpu_queue/$name.log
}

# 1. baseline confirm (cached compile, ~2 min)
run bench_base python bench.py

# 2. pallas2b e2e A/B at batch 1 (fresh compile of the batched kernel)
run bench_p2b env STP3_SPLAT_METHOD=pallas2b python bench.py

# 3. throughput at batch 8: default (pallas2) vs pallas2b
run tput8_base python benchmarks/throughput_bench.py 8
run tput8_p2b env STP3_SPLAT_METHOD=pallas2b python benchmarks/throughput_bench.py 8

# 4. splat microbench incl. pallas2b project path
run bevpool python benchmarks/bev_pool_bench.py

# 5. train step: default bwd vs pallas row-gather bwd (batch 2);
#    plus the fused SpatialGRU rollout with its hand-written VJP
run train_base python benchmarks/train_bench.py 2
run train_gbwd env STP3_SPLAT_BWD=pallas python benchmarks/train_bench.py 2
run train_sgru env STP3_SPATIAL_GRU=pallas python benchmarks/train_bench.py 2

# 6. train-step HBM-write audit
run train_hlo python benchmarks/train_hlo_traffic.py

# 7. dist+future sub-stage split with the FIXED in-graph-chain harness
#    (the old host-chain numbers were dispatch-bound at this scale)
run future_bd python benchmarks/future_breakdown.py

# 7b. fused pallas GRU rollouts: standalone A/Bs + e2e (single + combined)
run sgru python benchmarks/spatial_gru_bench.py
run dgru python benchmarks/dual_gru_bench.py
run bench_sgru env STP3_SPATIAL_GRU=pallas python bench.py
run bench_dgru env STP3_DUAL_GRU=pallas python bench.py
run bench_bothgru env STP3_SPATIAL_GRU=pallas STP3_DUAL_GRU=pallas python bench.py
run serve_bothgru env STP3_SPATIAL_GRU=pallas STP3_DUAL_GRU=pallas python benchmarks/serving_bench.py

# 8. full-forward stage split + HBM audit refresh
run fwd_bd python benchmarks/forward_breakdown.py
run hlo python benchmarks/hlo_traffic.py
