#!/bin/bash
# Round-3 serial TPU evidence capture (tunnel is single-client: run alone).
# tpu_kernel_check was already captured this round (benchmarks/out/).
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

run bench_r3          2400 python bench.py
run bench_train_step  1800 python benchmarks/bench_train_step.py
run bench_large_graph 1800 python benchmarks/bench_large_graph.py
run ablate_large      2400 python benchmarks/ablate_large.py
run bench_arxiv       2400 python benchmarks/bench_arxiv.py
run flagship_cosine   3600 python benchmarks/run_flagship.py \
    --lr-schedule cosine --ckpt benchmarks/out/flagship_ckpt \
    --json benchmarks/flagship_cosine.json
echo "ALL BENCHMARKS DONE"
