#!/bin/bash
# Wait for the TPU tunnel to come back, then run the remaining on-chip
# queue phases (part 1 stragglers + part 2). Single chip, serial.
cd "$(dirname "$0")/.."
echo "[wait] probing TPU backend every 120s..."
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[wait] TPU back at $(date +%H:%M:%S)"
    break
  fi
  sleep 120
done
bash tools/r3_chip_queue.sh
bash tools/r3_chip_queue2.sh
echo "[wait] ALL QUEUES COMPLETE $(date +%H:%M:%S)"
