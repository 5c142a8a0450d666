#!/bin/bash
# Round-4b serial TPU evidence capture (tunnel is single-client: run alone).
# Captures the post-fusion numbers: headline, train step, 1M-edge forward,
# partitioned S=1, OGB pipelines, compiled-TPU kernel oracle checks.
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

run bench_r4b             2400 python bench.py
run bench_train_step_r4b  1800 python benchmarks/bench_train_step.py
run bench_large_graph_r4b 1800 python benchmarks/bench_large_graph.py
run bench_partitioned_r4b 2400 python benchmarks/bench_partitioned.py
run tpu_kernel_check_r4b  2400 python benchmarks/tpu_kernel_check.py
run bench_arxiv_r4b       2400 python benchmarks/bench_arxiv.py
run bench_products_r4b    3600 python benchmarks/bench_arxiv.py --products
echo "ALL BENCHMARKS DONE"
