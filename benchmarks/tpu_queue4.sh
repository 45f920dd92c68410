#!/bin/bash
# Round-3 on-chip queue.
#
# Decisions pending:
#   * train_gbwd: STP3_SPLAT_BWD=pallas train backward — the round-2 run
#     compared identical configs (the batched splat's VJP ignored the
#     hatch until commit 20abbc3); this is the valid re-run.
#   * tput refresh: batch 1/2/4 rows in benchmarks/README.md are
#     pre-pallas2 (stale); add 16/32 to find the throughput knee
#     (VERDICT round-2 item 5).
# Informational refresh: serving paths post-pallas2b.
#
# Recorded negative result (do NOT re-queue): STP3_DUAL_GRU=pallas e2e
# bench timed out its 1800 s slot still compiling (round-2 queue.log
# 07:16->07:46, log contains only the backend banner). The XLA DualGRU
# rollout measures 1.17 ms standalone (future_breakdown), so the kernel's
# ceiling is ~1 ms e2e — not worth a multi-hour remote compile to decide.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue4

run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue4/queue.log
  timeout 2400 "$@" >/tmp/tpu_queue4/$name.log 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue4/queue.log
  tail -3 /tmp/tpu_queue4/$name.log
}

run train_gbwd env STP3_SPLAT_BWD=pallas python benchmarks/train_bench.py 2
run tput python benchmarks/throughput_bench.py 1 2 4 16 32
run serving python benchmarks/serving_bench.py
