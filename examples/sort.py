#!/usr/bin/env python
"""The list-sorting example — the reference's north-star task
(``/root/reference/examples/sort/sort.jl``), TPU-native.

Trains encoder -> 2x GNCore -> decoder to sort 2-10 integers (vocab 100) on
fully-connected graphs: node targets = "is minimum", edge targets =
"consecutive in sorted order".  Reference recipe: batch 4, AdamW 3e-4, dims
(384, 384, 384).

Usage:
    python examples/sort.py --steps 2000 --ckpt /tmp/sort_ckpt
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

import jax

from graphnets_tpu.data.sort_task import SortTaskConfig, gen_sample, \
    get_batch, sort_pad_spec
from graphnets_tpu.training.train import train_sort, train_sort_device
from graphnets_tpu.utils.metrics import MetricLogger


def show_sample(model, state, cfg, svg_dir=None):
    """Print one sample's prediction vs target, and optionally render the
    input/target/prediction graphs as SVG like the reference
    (``/root/reference/examples/sort/viz.jl``)."""
    rng = np.random.default_rng(123)
    pad = sort_pad_spec(SortTaskConfig(cfg.vocab_size, cfg.min_nodes,
                                       cfg.max_nodes, 1))
    one = SortTaskConfig(cfg.vocab_size, cfg.min_nodes, cfg.max_nodes, 1)
    x, y = get_batch(rng, one, pad)
    pred = model.apply(state.params, x)
    n = int(np.asarray(x.n_node)[0])
    values_onehot = np.asarray(x.nf)[:n]
    values = values_onehot.argmax(-1) + 1
    is_min_pred = np.asarray(pred.nf)[:n].argmax(-1)
    is_min_true = np.asarray(y.nf)[:n].argmax(-1)
    print(f"values:      {values.tolist()}")
    print(f"is_min pred: {is_min_pred.tolist()}")
    print(f"is_min true: {is_min_true.tolist()}")
    e = int(np.asarray(x.n_edge)[0])
    ef_pred = np.asarray(pred.ef)[:e].argmax(-1).reshape(n, n, order="F")
    ef_true = np.asarray(y.ef)[:e].argmax(-1).reshape(n, n, order="F")
    print(f"edge-matrix match: {(ef_pred == ef_true).mean():.2%}")

    if svg_dir:
        import os
        from graphnets_tpu.utils.viz import sort_input_svg, sort_target_svg
        os.makedirs(svg_dir, exist_ok=True)
        renders = {
            "input.svg": sort_input_svg(values_onehot),
            "target.svg": sort_target_svg(is_min_true,
                                          ef_true.flatten(order="F")),
            "pred.svg": sort_target_svg(is_min_pred,
                                        ef_pred.flatten(order="F")),
        }
        for name, svg in renders.items():
            with open(os.path.join(svg_dir, name), "w") as f:
                f.write(svg)
        print(f"SVGs written to {svg_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--core-dim", type=int, default=384)
    ap.add_argument("--n-cores", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--svg-dir", type=str, default=None,
                    help="write input/target/pred SVG renderings here")
    ap.add_argument("--host-loop", action="store_true",
                    help="use the reference-faithful step-per-dispatch host "
                    "loop (train_sort) instead of the device-side scan "
                    "trainer; ~500x slower through the TPU tunnel")
    args = ap.parse_args()

    cfg = SortTaskConfig(batch_size=args.batch_size)
    if args.host_loop:
        res = train_sort(steps=args.steps, cfg=cfg,
                         core_dims=(args.core_dim,) * 3,
                         n_cores=args.n_cores, learning_rate=args.lr,
                         seed=args.seed, log_every=args.log_every)
    else:
        # Default: the whole loop on device (batch gen inside jit, 100s of
        # steps per dispatch) — ~1385 steps/s on a v5e chip vs ~3 steps/s
        # for the host loop through the tunnel (benchmarks/RESULTS.md).
        chunk = max(1, min(500, args.steps,
                           args.log_every if args.log_every else 500))
        res = train_sort_device(
            steps=args.steps, cfg=cfg, core_dims=(args.core_dim,) * 3,
            n_cores=args.n_cores, learning_rate=args.lr, seed=args.seed,
            chunk=chunk,
            log_fn=(lambda step, m: print(
                f"step {step}: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in m.items()), flush=True)))
    print(f"final metrics: {res.metrics}")
    print(f"throughput: {res.steps_per_sec:.2f} steps/s")
    show_sample(res.model, res.state, cfg, svg_dir=args.svg_dir)

    if args.ckpt:
        from graphnets_tpu.training.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.ckpt)
        mgr.save(args.steps, res.state, wait=True)
        mgr.close()
        print(f"checkpoint saved to {args.ckpt}")


if __name__ == "__main__":
    main()
