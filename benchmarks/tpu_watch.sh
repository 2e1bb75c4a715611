#!/bin/bash
# Poll the TPU data plane; when it recovers, launch the given queue file.
# Usage: bash benchmarks/tpu_watch.sh <queuefile> [per-run timeout]
set -u
QUEUE="$1"
TMO="${2:-2700}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="$REPO/benchmarks/runs/tpu_watch.log"
while true; do
  if timeout 90 python -c "
import numpy as np, jax
x = jax.device_put(np.ones((8, 8), np.float32))
assert float(np.asarray(x)[0, 0]) == 1.0
print('tpu ok')" >>"$LOG" 2>&1; then
    echo "[$(date +%H:%M:%S)] TPU recovered; launching queue $QUEUE" >>"$LOG"
    exec bash "$REPO/benchmarks/run_queue.sh" "$QUEUE" "$TMO"
  fi
  echo "[$(date +%H:%M:%S)] TPU still down" >>"$LOG"
  sleep 120
done
