#!/usr/bin/env bash
# Benchmark driver (reference benchmark.sh): runs the harness and collects
# bench_results_<device>.json.  Usage: ./benchmark.sh [0.6B|1.7B|both|quick]
set -euo pipefail
cd "$(dirname "$0")"

TARGET="${1:-0.6B}"

run_size() {
  local size="$1"
  echo "=== $size: throughput (fast path) ==="
  MODEL_SIZE="$size" python benchmarks/throughput.py
  echo "=== $size: chunk sweep ==="
  MODEL_SIZE="$size" python benchmarks/chunk_sweep.py
  echo "=== $size: baseline (parity path) ==="
  MODEL_SIZE="$size" python benchmarks/baseline.py
}

case "$TARGET" in
  quick)
    BENCH_STEPS=48 BENCH_REPEATS=1 MODEL_SIZE=0.6B python benchmarks/throughput.py
    ;;
  0.6B) run_size 0.6B; python benchmarks/compare_modes.py ;;
  1.7B) run_size 1.7B ;;
  both) run_size 0.6B; python benchmarks/compare_modes.py; run_size 1.7B ;;
  *) echo "usage: $0 [0.6B|1.7B|both|quick]"; exit 2 ;;
esac

echo "results:"; ls bench_results_*.json
