#!/usr/bin/env python
"""Large-graph node classification — the GraphSAGE-style workflow the
reference cannot express (its dense PN^2 design caps graphs at tiny PN;
SURVEY.md §2.3 "Neighbor sampling / large-graph loaders").

Pipeline: ``LargeGraph`` CSC store -> fixed-fanout ``NeighborSampler``
(static shapes, threaded native kernel) -> device-resident feature table
-> EncodeProcessDecode -> masked CE on seed nodes -> Adam, with held-out
validation accuracy.

By default trains on a synthetic citation-shaped graph so the example
runs anywhere (CPU ~1 min).  Point ``--ogb-root`` at an on-disk OGB raw
layout (e.g. ogbn-arxiv) to train on real data via
``data.ogb.load_ogb_node_dataset`` — the rest of the pipeline is
identical.

Usage:
  python examples/node_classification.py --steps 200
  python examples/node_classification.py --ogb-root /data/ogb --ogb-name ogbn-arxiv
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from graphnets_tpu.data.large_graph import (LargeGraph, NeighborSampler,
                                            device_feature_table)
from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.training.losses import masked_logit_crossentropy


def synthetic_citation_graph(n=2000, avg_deg=8, d=32, n_classes=8, seed=0):
    """Citation-shaped synthetic data: power-law in-degree, features
    weakly correlated with labels so learning is measurable."""
    rng = np.random.default_rng(seed)
    e = n * avg_deg
    p = 1.0 / (np.arange(n) + 10.0)
    cdf = np.cumsum(p / p.sum())
    ranks = rng.permutation(n).astype(np.int64)
    receivers = ranks[np.searchsorted(cdf, rng.random(e),
                                      side="right").clip(0, n - 1)]
    senders = rng.integers(0, n, e)
    labels = rng.integers(0, n_classes, n)
    feat = rng.normal(size=(n, d)).astype(np.float32)
    feat[:, :n_classes] += 3.0 * np.eye(n_classes, dtype=np.float32)[labels]
    g = LargeGraph.from_coo(senders, receivers, feat, labels)
    ids = rng.permutation(n)
    splits = {"train": ids[: int(0.8 * n)], "valid": ids[int(0.8 * n):]}
    return g, splits, n_classes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--fanouts", type=int, nargs="+", default=[8, 4])
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ogb-root", default=None,
                    help="on-disk OGB root dir (raw csv layout)")
    ap.add_argument("--ogb-name", default="ogbn-arxiv")
    args = ap.parse_args()

    if args.ogb_root:
        from graphnets_tpu.data.ogb import load_ogb_node_dataset
        ds = load_ogb_node_dataset(args.ogb_root, args.ogb_name)
        g, splits, n_classes = ds.graph, ds.splits, ds.num_classes
        print(f"loaded {ds.name}: {g.num_nodes} nodes, {g.num_edges} edges,"
              f" {n_classes} classes")
    else:
        g, splits, n_classes = synthetic_citation_graph()
        print(f"synthetic citation graph: {g.num_nodes} nodes, "
              f"{g.num_edges} edges, {n_classes} classes")

    d_feat = g.node_feat.shape[1]
    sampler = NeighborSampler(g, fanouts=tuple(args.fanouts),
                              batch_size=args.batch, seed=1,
                              emit_node_ids=True)
    feat_dev = device_feature_table(g)
    model = EncodeProcessDecode((0, d_feat, 0), (args.hidden,) * 3,
                                (1, n_classes, 0), n_cores=args.cores)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, graph, node_ids, labels, label_mask,
             seed_idx, feat):
        graph = graph.with_features(nf=jnp.take(feat, node_ids, axis=0))

        def loss_fn(p):
            pred = model.apply(p, graph, training=True)
            logits = pred.nf[seed_idx]
            onehot = jax.nn.one_hot(labels, n_classes)
            return masked_logit_crossentropy(logits, onehot, label_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, graph, node_ids, seed_idx, feat):
        graph = graph.with_features(nf=jnp.take(feat, node_ids, axis=0))
        pred = model.apply(params, graph)
        return jnp.argmax(pred.nf[seed_idx], axis=-1)

    def accuracy(node_set):
        correct = total = 0
        for b in sampler.epoch(node_set, shuffle=False):
            yhat = np.asarray(predict(params, b.graph, b.node_ids,
                                      b.seed_local_idx, feat_dev))
            mask = np.asarray(b.label_mask)
            correct += int((yhat[mask] == np.asarray(b.labels)[mask]).sum())
            total += int(mask.sum())
        return correct / max(total, 1)

    t0 = time.time()
    it = iter(sampler.epoch(splits["train"]))
    for i in range(1, args.steps + 1):
        try:
            b = next(it)
        except StopIteration:
            it = iter(sampler.epoch(splits["train"]))
            b = next(it)
        params, opt_state, loss = step(params, opt_state, b.graph,
                                       b.node_ids, b.labels, b.label_mask,
                                       b.seed_local_idx, feat_dev)
        if i % args.log_every == 0 or i == args.steps:
            print(f"step {i:5d}  loss {float(loss):.4f}  "
                  f"({(time.time()-t0)/i*1e3:.0f} ms/step avg)")

    acc = accuracy(splits["valid"])
    print(f"validation accuracy: {acc:.4f} "
          f"({len(splits['valid'])} held-out nodes)")
    print("node_classification ok")
    return acc


if __name__ == "__main__":
    sys.exit(0 if main() > 0.5 else 1)
