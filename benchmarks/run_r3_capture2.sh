#!/bin/bash
# Round-3 capture #2: validate + measure the sorted-gather / fused-addend
# kernels and the fixed arxiv harness.  Serial — the tunnel is
# single-client.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/out
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%T) ==="
  timeout "$to" python -u "$@" > "benchmarks/out/$name.txt" 2>&1
  echo "=== $name exit=$? $(date +%T) ==="
  tail -3 "benchmarks/out/$name.txt" | grep -v WARNING || true
}

run tpu_kernel_check2  2400 benchmarks/tpu_kernel_check.py
run bench_large_graph2 1800 benchmarks/bench_large_graph.py
run ablate_large2      2400 benchmarks/ablate_large.py
run bench_r3b          2400 bench.py
run bench_train_step2  1800 benchmarks/bench_train_step.py
run bench_arxiv2       2400 benchmarks/bench_arxiv.py
run compile_probe      3600 benchmarks/compile_probe.py
echo "ALL CAPTURE2 DONE"
