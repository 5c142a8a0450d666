#!/usr/bin/env python
"""Large-graph forward benchmark: one 65k-node / 1M-edge graph through a
3-core GN stack, bf16 — a scale the reference's dense design cannot
represent (PN^2 = 4.3e9 edge slots; the node->edge broadcasters alone would
need ~2 PB).  Sparse-COO runs it on one chip."""

import sys, time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from graphnets_tpu.graph import GraphsTuple
from graphnets_tpu.models.gn_core import GNCore, GNCoreList
from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)

N, DEG, D = 65536, 16, 256
E = N * DEG
DTYPE = jnp.bfloat16

rng = np.random.default_rng(0)
senders = rng.integers(0, N, size=E).astype(np.int32)
receivers = np.sort(rng.integers(0, N, size=E)).astype(np.int32)  # CSR order
g = GraphsTuple(
    senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
    node_graph=jnp.zeros((N,), jnp.int32), edge_graph=jnp.zeros((E,), jnp.int32),
    n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
    node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
    graph_mask=jnp.ones((1,), bool),
    ef=jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), DTYPE),
    nf=jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DTYPE),
    gf=jnp.asarray(rng.normal(size=(1, D)).astype(np.float32), DTYPE),
)

stack = GNCoreList([GNCore((D, D, D)) for _ in range(3)])
params = jax.tree_util.tree_map(
    lambda x: x.astype(DTYPE), stack.init(jax.random.PRNGKey(0)))

from bench import time_iterated  # noqa: E402  (repo-root bench harness)
t = time_iterated(lambda x: stack.apply(params, x), g, l1=2, l2=20, trials=4)
print(f"large-graph fwd: N={N} E={E} D={D}: {t*1e3:.2f} ms/step  "
      f"{E/t:.3e} edges/s")
