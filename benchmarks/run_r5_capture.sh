#!/bin/bash
# Round-5 serial TPU evidence capture (tunnel is single-client: run alone;
# see the memory note — a second client can wedge the far end for minutes).
# Captures: headline fwd + train, the 1M-edge TRAINING step + agg-gate A/B,
# partitioned S=1 at BOTH shapes, OGB pipelines + device-step decomposition,
# the sender-gather floor study, the FFN-gate sweep, and the compiled-TPU
# kernel oracle checks.
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

run bench_r5                   2400 python bench.py
run bench_train_step_r5        1800 python benchmarks/bench_train_step.py
run bench_large_graph_r5       1800 python benchmarks/bench_large_graph.py --mode fwd
run bench_large_train_on_r5    1800 python benchmarks/bench_large_graph.py --mode train --g1-agg 1
run bench_large_train_off_r5   1800 python benchmarks/bench_large_graph.py --mode train --g1-agg 0
run bench_partitioned_r5       2400 python benchmarks/bench_partitioned.py
run bench_partitioned_large_r5 2400 python benchmarks/bench_partitioned.py --large
run bench_arxiv_r5             1800 python benchmarks/bench_arxiv.py
run bench_products_r5          1800 python benchmarks/bench_arxiv.py --products
run ablate_ogb_step_r5         1800 python benchmarks/ablate_ogb_step.py
run exp_random_gather_r5       1200 python benchmarks/exp_random_gather.py
run exp_ffn_train_gate_r5      1800 python benchmarks/exp_ffn_train_gate.py
run tpu_kernel_check_r5        2400 python benchmarks/tpu_kernel_check.py
