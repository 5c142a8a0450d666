#!/usr/bin/env python
"""ogbn-arxiv-shaped benchmark (BASELINE config 4's standing number).

No network egress in this environment, so the graph is synthetic but
arxiv-shaped: 169,343 nodes, ~1.17M directed edges (power-law-ish in-degree
via preferential attachment on a shuffled node order), 128-d features, 40
classes.  The measured pipeline is exactly what a real OGB run uses
(``load_ogb_node_dataset`` feeds the same ``LargeGraph`` + sampler +
training step; ``tests/test_ogb.py`` covers the loader itself):

  fixed-fanout neighbor sampling (native kernel) -> EncodeProcessDecode
  (2 cores, hidden 256) -> masked CE on seed nodes -> Adam.

Reports sampler throughput (host), train-step device time (honest in-jit
scan harness), end-to-end steps/s, and seed-nodes/s.
"""

import sys, time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from graphnets_tpu.data.large_graph import LargeGraph, NeighborSampler
from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.training.losses import masked_logit_crossentropy
from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=512,
                 help="seed nodes per step (r5: larger batches amortize "
                 "the random-gather floor over more FLOPs)")
_ap.add_argument("--products", action="store_true",
                 help="ogbn-products shape (2.45M nodes / 124M edges) "
                 "instead of arxiv — exercises the large-graph store and "
                 "sampler two orders of magnitude up; the device step is "
                 "shape-identical (fanout-determined subgraphs)")
_args, _ = _ap.parse_known_args()

if _args.products:
    N, E_TARGET, D_FEAT, N_CLASSES = 2_449_029, 123_718_280, 100, 47
else:
    N, E_TARGET, D_FEAT, N_CLASSES = 169_343, 1_166_243, 128, 40
HIDDEN, N_CORES = 256, 2
FANOUTS, BATCH = (10, 10), _args.batch
DTYPE = jnp.bfloat16


def make_arxiv_shaped(seed=0):
    rng = np.random.default_rng(seed)
    # Preferential-attachment-ish receivers: sample targets from a
    # power-law over node ranks, then shuffle ranks so degree is not
    # correlated with node id (as in a real citation graph).  Inverse-CDF
    # sampling via searchsorted — rng.choice(p=...) is O(E) per draw at
    # this scale.
    ranks = rng.permutation(N).astype(np.int32)
    p = 1.0 / (np.arange(N) + 10.0)
    cdf = np.cumsum(p / p.sum())
    receivers = ranks[np.searchsorted(
        cdf, rng.random(E_TARGET), side="right").clip(0, N - 1)]
    senders = rng.integers(0, N, size=E_TARGET, dtype=np.int32)
    labels = rng.integers(0, N_CLASSES, size=N)
    feat = rng.normal(size=(N, D_FEAT)).astype(np.float32)
    feat[:, :N_CLASSES] += 2.0 * np.eye(N_CLASSES, dtype=np.float32)[labels]
    return LargeGraph.from_coo(senders, receivers, feat,
                               labels.astype(np.int64))


def main():
    t0 = time.perf_counter()
    g = make_arxiv_shaped()
    print(f"# graph build: {time.perf_counter()-t0:.1f}s  "
          f"N={g.num_nodes} E={g.num_edges}", file=sys.stderr)

    # Round 4: device-resident features + index-only batches.  Round 3's
    # sampler was dominated by gathering and shipping ~29 MB of node
    # features per batch host->device; now the [N+1, D] feature table
    # lives in HBM once and each batch carries only int32 node ids (the
    # in-step device gather assembles nf).  The native sampler itself is
    # threaded (gt_sample_layer_par).
    from graphnets_tpu.data.large_graph import device_feature_table
    sampler = NeighborSampler(g, fanouts=FANOUTS, batch_size=BATCH, seed=1,
                              emit_node_ids=True)
    feat_dev = device_feature_table(g, DTYPE)
    model = EncodeProcessDecode((0, D_FEAT, 0), (HIDDEN, HIDDEN, HIDDEN),
                                (1, N_CLASSES, 0), n_cores=N_CORES)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def cast_g(gt):
        return gt.with_features(
            ef=gt.ef.astype(DTYPE) if gt.ef is not None else None,
            nf=gt.nf.astype(DTYPE) if gt.nf is not None else None,
            gf=gt.gf.astype(DTYPE) if gt.gf is not None else None)

    # bf16 compute params from the f32 masters (round 5: the step
    # previously ran the matmuls in f32 — params were never cast — at
    # roughly half MXU rate; shared recipe: bench.cast_params).
    from bench import cast_params as cast_p

    @jax.jit
    def step(params, opt_state, graph, node_ids, labels, label_mask,
             seed_idx, feat):
        graph = graph.with_features(nf=jnp.take(feat, node_ids, axis=0))

        def loss_fn(p):
            pred = model.apply(cast_p(p), graph, training=True)
            logits = pred.nf[seed_idx]
            onehot = jax.nn.one_hot(labels, N_CLASSES)
            return masked_logit_crossentropy(logits, onehot, label_mask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # -- sampler throughput (host side) ------------------------------------
    train_nodes = np.arange(g.num_nodes)
    batches = []
    it = sampler.epoch(train_nodes)
    batches.append(next(it))     # warmup: first batch pays one-time costs
    t0 = time.perf_counter()
    for _ in range(5):
        b = next(it)
        batches.append(b)
    t_sample = (time.perf_counter() - t0) / (len(batches) - 1)
    print(f"# sampler: {t_sample*1e3:.1f} ms/batch  "
          f"{BATCH/t_sample:.0f} seeds/s  (subgraph: "
          f"{batches[0].graph.num_node_slots} nodes, "
          f"{batches[0].graph.num_edge_slots} edge slots)", file=sys.stderr)

    # -- device step time (honest harness: scan over preloaded batches) ----
    b0 = batches[0]
    graph0 = cast_g(b0.graph)

    # feat_dev rides in the CARRY (a jit input): as a closure constant it
    # would be baked into the serialized HLO and blow the tunnel's upload
    # limit at products scale (~0.5 GB table -> HTTP 413).
    def carry_step(carry):
        params, opt_state, feat = carry
        params, opt_state, _ = step(params, opt_state, graph0, b0.node_ids,
                                    b0.labels, b0.label_mask,
                                    b0.seed_local_idx, feat)
        return (params, opt_state, feat)

    from bench import time_iterated
    t_step = time_iterated(carry_step, (params, opt_state, feat_dev),
                           l1=3, l2=24)
    print(f"# device train step: {t_step*1e3:.2f} ms", file=sys.stderr)

    # -- e2e over DISTINCT preloaded batches (honest harness) --------------
    # The earlier per-dispatch host loop measured tunnel latency, not the
    # pipeline (RESULTS.md's own warning).  Here the distinct sampled
    # batches are stacked on device and the step cycles through them inside
    # the same in-jit-scan differencing harness — so the number includes
    # per-batch variation (different subgraph shapes' gathers) but no
    # dispatch/readback artifacts.  End-to-end throughput for a prefetching
    # pipeline (data/prefetch.py overlaps host sampling with device steps)
    # is then bounded by max(sampler, device step).  The stack rides in the
    # scan CARRY (a jit input, streamed as device buffers), NOT as a
    # closure constant — constants are baked into the serialized HLO and a
    # 6 x ~50 MB graph stack blows the tunnel's remote_compile upload
    # limit (HTTP 413, observed with 24 closure batches).
    import jax.tree_util as jtu
    K = len(batches)
    stacked = jtu.tree_map(
        lambda *xs: jnp.stack(xs),
        *[(cast_g(b.graph), b.node_ids, b.labels, b.label_mask,
           b.seed_local_idx) for b in batches])

    def cycle_step(carry):
        params, opt_state, i, stk, feat = carry
        xs = jtu.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i % K, 0,
                                                   keepdims=False), stk)
        gr, nid, lab, lm, si = xs
        params, opt_state, _ = step(params, opt_state, gr, nid, lab, lm,
                                    si, feat)
        return (params, opt_state, i + 1, stk, feat)

    t_cycle = time_iterated(cycle_step,
                            (params, opt_state, jnp.zeros((), jnp.int32),
                             stacked, feat_dev),
                            l1=3, l2=18)
    t_e2e = max(t_sample, t_cycle)
    print(f"# device step (cycling {K} distinct batches): "
          f"{t_cycle*1e3:.2f} ms", file=sys.stderr)
    print(f"# pipelined e2e bound = max(sampler, device) = "
          f"{t_e2e*1e3:.1f} ms/step  {BATCH/t_e2e:.0f} seeds/s",
          file=sys.stderr)

    import json
    print(json.dumps({
        "metric": "arxiv_shaped_seed_nodes_per_s",
        "sampler_ms_per_batch": t_sample * 1e3,
        "device_step_ms": t_step * 1e3,
        "device_step_cycling_ms": t_cycle * 1e3,
        "e2e_ms_per_step": t_e2e * 1e3,
        "value": BATCH / t_e2e,
        "unit": "seeds/s",
    }))


if __name__ == "__main__":
    main()
