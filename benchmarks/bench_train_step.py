#!/usr/bin/env python
"""Training-step benchmark: fwd + bwd + AdamW on the headline workload.

Same graph batch as bench.py (8 graphs x 128 nodes, avg degree 16,
dims (384, 384, 384), 3 cores), bf16 activations / f32 params, measured
with the honest in-jit-scan harness.  Tracks the BASELINE "train step"
number (RESULTS.md).
"""

import sys, time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from graphnets_tpu.models.gn_core import GNCore, GNCoreList
from graphnets_tpu.training.losses import graph_loss_nf_ef
from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

import bench  # repo-root harness + workload

enable_compilation_cache()
enable_pallas(True)

D = bench.D
DTYPE = bench.DTYPE


def main():
    g, _ = bench.build_graphs()
    # bf16 activations; targets: random one-hot-ish node/edge labels.
    rng = np.random.default_rng(1)
    E, N = g.num_edge_slots, g.num_node_slots
    y = g.with_features(
        ef=jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), DTYPE),
        nf=jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DTYPE),
        gf=None)

    stack = GNCoreList([GNCore((D, D, D)) for _ in range(3)])
    params = stack.init(jax.random.PRNGKey(0))  # f32 params
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    def cast(p):
        return jax.tree_util.tree_map(lambda x: x.astype(DTYPE), p)

    def step(carry):
        params, opt_state = carry

        def loss_of(p):
            pred = stack.apply(cast(p), g, training=True)
            return graph_loss_nf_ef(pred, y)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state)

    t = bench.time_iterated(step, (params, opt_state), l1=3, l2=24)
    n_edges = int(np.sum(np.asarray(g.n_edge)))
    print(f"train step: {t*1e3:.2f} ms  {n_edges/t:.3e} edges/s")


if __name__ == "__main__":
    main()
