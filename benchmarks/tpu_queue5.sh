#!/bin/bash
# Round-3 (second session) on-chip decision queue. Run serially on the
# tunneled v5e; each line answers one open question. Verdict procedure:
# a variant ships as default only if it beats the incumbent on the
# end-to-end metric it affects (train-step ms for train knobs, bench.py
# p50 for inference knobs); otherwise record the negative result at the
# code site and in benchmarks/README.md.
#
# Open questions this session:
#  q1  is encoder remat a WIN or a LOSS at batch 2? (never A/B'd: remat
#      trades an encoder-fwd recompute (~15 ms/sample) for activation HBM;
#      at batch 2 the memory may fit without it)
#  q2  train-step batch knee: samples/s at batch 4/8 (inference knee is 8;
#      train never measured past 2)
#  q3  train roofline: flops/bytes floors + top fwd/bwd writers, to target
#      the next train optimisation
#  q4  int8 conv microbench: does XLA lower int8 convs to the 2x-rate MXU
#      path at BEV shapes? (gates any quantized-serving work)
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue5

run() { name=$1; shift; echo "== $name: $*"; "$@" 2>&1 | tail -40 | tee /tmp/tpu_queue5/$name.log; }

run q1_remat_none     env REMAT=none    python benchmarks/train_bench.py 2
run q1_remat_encoder  env REMAT=encoder python benchmarks/train_bench.py 2
run q2_train_b4       python benchmarks/train_bench.py 4
run q2_train_b8       python benchmarks/train_bench.py 8
run q3_train_traffic  python benchmarks/train_hlo_traffic.py 2 --top 12
run q4_int8_conv      python benchmarks/int8_conv_bench.py
