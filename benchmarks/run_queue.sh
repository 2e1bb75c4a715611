#!/bin/bash
# Sequential TPU run queue for multitask tuning sweeps.
# Usage: bash benchmarks/run_queue.sh <queuefile> [per-run timeout seconds]
# Each non-empty, non-comment line of <queuefile> is a full argument string
# for benchmarks/multitask_run.py. Runs execute one at a time (the TPU
# tunnel admits a single process). Logs go to benchmarks/runs/q_<n>_<tag>.log.
set -u
QUEUE="$1"
TMO="${2:-2700}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/benchmarks/runs"
n=0
while IFS= read -r line; do
  case "$line" in ''|'#'*) continue;; esac
  n=$((n+1))
  tag=$(echo "$line" | tr ' /=' '___' | cut -c1-80)
  log="$REPO/benchmarks/runs/q${n}_${tag}.log"
  echo "=== [$(date +%H:%M:%S)] run $n: $line" | tee -a "$REPO/benchmarks/runs/queue.log"
  timeout "$TMO" python "$REPO/benchmarks/multitask_run.py" $line >"$log" 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] run $n done rc=$rc: $(tail -1 "$log")" >> "$REPO/benchmarks/runs/queue.log"
done < "$QUEUE"
echo "QUEUE COMPLETE $(date +%H:%M:%S)" >> "$REPO/benchmarks/runs/queue.log"
