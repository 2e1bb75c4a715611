#!/bin/bash
# Full-length synthetic training through the three realworld CLI pipelines at
# the REFERENCE config settings (epochs, batch size, plateau schedule, stops)
# — VERDICT r4 task 3b: with real datasets unreachable (no egress), run every
# pipeline end-to-end at reference settings on the synthetic fallbacks so the
# only untested step on real-data day is file parsing.  Curves land in
# benchmarks/runs/realworld_*.jsonl; benchmarks/realworld_synthetic.py
# collects them into RESULTS_realworld_synthetic.json.
#
# Usage: bash benchmarks/run_realworld_synthetic.sh  (TPU, ~1-2 h total;
# each run ends on the reference's min-LR plateau stop, not an epoch cap)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
RUNS="$REPO/benchmarks/runs"
mkdir -p "$RUNS"
cd "$REPO"

run() {
  name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] realworld_synthetic $name: $*"
  timeout 7200 python -m "$@" > "$RUNS/realworld_${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? $(tail -1 "$RUNS/realworld_${name}.log")"
}

# 1. ZINC, reference config as-is (no-edge-feature recipe,
#    realworld_benchmark/README.md:61: hidden 75, out 70)
run zinc_noedge pna_tpu.cli.main_molecules --synthetic \
  --metrics_path "$RUNS/realworld_zinc_noedge.jsonl"

# 2. ZINC, the 0.188-MAE edge-feature recipe (README.md:62)
run zinc_edge pna_tpu.cli.main_molecules --synthetic \
  --edge_feat True --hidden_dim 70 --out_dim 60 --edge_dim 50 \
  --divide_input_first True \
  --metrics_path "$RUNS/realworld_zinc_edge.jsonl"

# 3. MolHIV, reference config (README.md:43-45 leaderboard recipe)
run hiv pna_tpu.cli.main_HIV --synthetic \
  --metrics_path "$RUNS/realworld_hiv.jsonl"

# 4. MNIST superpixels, reference config (README.md:64-70)
run mnist pna_tpu.cli.main_superpixels --synthetic --dataset MNIST \
  --metrics_path "$RUNS/realworld_mnist.jsonl"

echo "REALWORLD SYNTHETIC COMPLETE $(date +%H:%M:%S)"
