#!/bin/bash
# Round-3 capture #2: re-measure everything the sorted-gather kernel and
# bf16 partial gathers touch, plus the fixed arxiv cycling harness.
# Serial — the tunnel is single-client.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/out
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%T) ==="
  timeout "$to" "$@" > "benchmarks/out/$name.txt" 2>&1
  echo "=== $name exit=$? $(date +%T) ==="
  tail -3 "benchmarks/out/$name.txt" | grep -v WARNING || true
}

run tpu_kernel_check2  1200 python benchmarks/tpu_kernel_check.py
run ablate_large2      2400 python benchmarks/ablate_large.py
run bench_large_graph2 1800 python benchmarks/bench_large_graph.py
run bench_train_step2  1800 python benchmarks/bench_train_step.py
run bench_r3b          2400 python bench.py
run bench_arxiv2       2400 python benchmarks/bench_arxiv.py
echo "ALL CAPTURE2 DONE"
