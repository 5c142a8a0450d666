#!/bin/bash
# Serial TPU evidence capture (the tunnel is single-client: NEVER run two
# of these concurrently).  Logs to benchmarks/out/.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/out
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TIMEOUT" "$@" > "benchmarks/out/$name.txt" 2>&1
  echo "=== $name exit=$? ==="
  tail -5 "benchmarks/out/$name.txt" | grep -v WARNING || true
}

TIMEOUT=${KERNEL_TIMEOUT:-900}   run tpu_kernel_check python benchmarks/tpu_kernel_check.py
TIMEOUT=${BENCH_TIMEOUT:-2400}   run bench_r3          python bench.py
TIMEOUT=${TRAIN_TIMEOUT:-1800}   run bench_train_step  python benchmarks/bench_train_step.py
TIMEOUT=${LARGE_TIMEOUT:-1800}   run bench_large_graph python benchmarks/bench_large_graph.py
TIMEOUT=${ABLATE_TIMEOUT:-2400}  run ablate_large      python benchmarks/ablate_large.py
TIMEOUT=${ARXIV_TIMEOUT:-2400}   run bench_arxiv       python benchmarks/bench_arxiv.py
echo "ALL BENCHMARKS DONE"
