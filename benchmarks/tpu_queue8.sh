#!/bin/bash
# Round-4 on-chip decision queue: POLICY remat of the future stage
# (MODEL.REMAT 'gates' — round-3 judge ask #2). queue6/queue7 closed the
# structural remat space: whole-stage and per-cell remat both LOSE
# because their backward recomputes the bandwidth-bound gate CONVS.
# 'gates' is the one untried knob that satisfies the traffic-reduction
# rule: jax.checkpoint(policy=save conv/dot outputs) stores the conv
# results and recomputes only the ELEMENTWISE gate math (sigmoid/tanh/
# trust-gate mixing) — dropping the stored-gate tensors' HBM traffic
# without any conv recompute. future_prediction writes 27.9 GB fwd +
# 28.0 GB bwd of the 87 GB step total (hlo_traffic, queue5/6).
#
#  q1  batch-2 train step, REMAT=encoder          (control, 478.5 ms r3)
#  q2  batch-2 train step, REMAT=encoder+gates
#  q3  if q2 wins: batch-4 fit check (encoder+gates)
# Verdict: 'encoder+gates' replaces 'encoder' in train YAMLs only if q2
# beats q1 on samples/s; a loss closes the remat space for good
# (whole-stage + per-cell + per-op policy all measured).
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue8

run() { name=$1; shift; echo "== $name: $*"; "$@" 2>&1 | tail -40 | tee /tmp/tpu_queue8/$name.log; }

run q1_b2_encoder  env REMAT=encoder python benchmarks/train_bench.py 2
run q2_b2_encgates env REMAT=encoder+gates python benchmarks/train_bench.py 2
run q3_b4_encgates env REMAT=encoder+gates python benchmarks/train_bench.py 4
