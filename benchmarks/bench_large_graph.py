#!/usr/bin/env python
"""Large-graph benchmark: one 65k-node / 1M-edge graph through a 3-core GN
stack, bf16 — a scale the reference's dense design cannot represent
(PN^2 = 4.3e9 edge slots; the node->edge broadcasters alone would need
~2 PB).  Sparse-COO runs it on one chip.

Modes:
  --mode fwd    forward pass (the historical capture; default)
  --mode train  full training step: fwd + bwd + AdamW on masked
                node+edge logit losses, matching the reference's training
                loop semantics (/root/reference/examples/sort/sort.jl:122-132)
                at BASELINE config-4/5 scale.  bf16 activations, f32
                params/optimizer.

Flags:
  --g1-agg {auto,0,1}  pin the G=1 agg-fusion training gate for A/B
                       (auto = config default).
"""

import argparse
import sys
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from graphnets_tpu.graph import GraphsTuple
from graphnets_tpu.models.gn_core import GNCore, GNCoreList
from graphnets_tpu.utils.config import enable_pallas, get_config
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)

N, DEG, D = 65536, 16, 256
E = N * DEG
DTYPE = jnp.bfloat16


def build_graph():
    rng = np.random.default_rng(0)
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, N, size=E)).astype(np.int32)  # CSR
    g = GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), DTYPE),
        nf=jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DTYPE),
        gf=jnp.asarray(rng.normal(size=(1, D)).astype(np.float32), DTYPE),
    )
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("fwd", "train"), default="fwd")
    ap.add_argument("--g1-agg", choices=("auto", "0", "1"), default="auto")
    args = ap.parse_args()

    if args.g1_agg != "auto":
        get_config().g1_agg_fusion_training = args.g1_agg == "1"

    from bench import time_iterated  # repo-root harness

    g = build_graph()
    stack = GNCoreList([GNCore((D, D, D)) for _ in range(3)])

    if args.mode == "fwd":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(DTYPE), stack.init(jax.random.PRNGKey(0)))
        t = time_iterated(lambda x: stack.apply(params, x), g,
                          l1=2, l2=20, trials=4)
        print(f"large-graph fwd: N={N} E={E} D={D}: {t*1e3:.2f} ms/step  "
              f"{E/t:.3e} edges/s")
        return

    # --- training step: fwd + bwd + AdamW, masked nf+ef logit loss --------
    import optax
    from graphnets_tpu.training.losses import graph_loss_nf_ef

    rng = np.random.default_rng(1)
    y = g.with_features(
        ef=jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), DTYPE),
        nf=jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DTYPE),
        gf=None)

    params = stack.init(jax.random.PRNGKey(0))  # f32 params
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    from bench import cast_params as cast  # shared mixed-precision recipe

    # g and y ride in the CARRY (jit inputs): as closure constants the
    # ~1.6 GB of feature/index arrays would be baked into the serialized
    # HLO and stall the tunnel's remote compile (the bench_arxiv.py
    # HTTP-413 class of failure — observed r5 as a >30 min compile hang).
    def step(carry):
        params, opt_state, g, y = carry

        def loss_of(p):
            pred = stack.apply(cast(p), g, training=True)
            return graph_loss_nf_ef(pred, y)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, g, y)

    t = time_iterated(step, (params, opt_state, g, y),
                      l1=2, l2=10, trials=4)
    gate = get_config().g1_agg_fusion_training
    print(f"large-graph train: N={N} E={E} D={D} g1_agg_train={gate}: "
          f"{t*1e3:.2f} ms/step  {E/t:.3e} edges/s")


if __name__ == "__main__":
    main()
