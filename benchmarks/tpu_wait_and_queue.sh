#!/bin/bash
# Poll the tunneled TPU; when it answers, run the round-2 A/B queue.
# Logs: /tmp/tpu_queue/waiter.log (poll attempts) + per-step logs from
# tpu_queue.sh. Exits nonzero if the chip never comes back.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue
for i in $(seq 1 200); do
  echo "poll $i $(date +%H:%M:%S)" >> /tmp/tpu_queue/waiter.log
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
      >> /tmp/tpu_queue/waiter.log 2>&1; then
    echo "TPU UP $(date +%H:%M:%S)" >> /tmp/tpu_queue/waiter.log
    exec bash benchmarks/tpu_queue.sh
  fi
  sleep 120
done
echo "TPU never came back" >> /tmp/tpu_queue/waiter.log
exit 1
