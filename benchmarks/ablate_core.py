#!/usr/bin/env python
"""Ablation: where does the GNCore forward time go on the TPU?

Times each sub-computation of the core with the honest harness (in-jit scan
+ readback, fixed tunnel overhead measured once with an empty program).
"""

import sys, time
sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

E, N, B, D = 16384, 1024, 8, 384
DTYPE = jnp.bfloat16
L = 200

rng = np.random.default_rng(0)
receivers = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
senders = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
edge_graph = jnp.asarray(np.sort(rng.integers(0, B, E)).astype(np.int32))
node_graph = jnp.asarray(np.sort(rng.integers(0, B, N)).astype(np.int32))
ef = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), DTYPE)
nf = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DTYPE)
gf = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32), DTYPE)
emask = jnp.ones((E,), bool)

W_e = jnp.asarray(rng.normal(size=(3 * D + D, D)).astype(np.float32) * .02,
                  DTYPE)
W_n = jnp.asarray(rng.normal(size=(3 * D, D)).astype(np.float32) * .02,
                  DTYPE)
W1 = jnp.asarray(rng.normal(size=(D, 4 * D)).astype(np.float32) * .02, DTYPE)
W2 = jnp.asarray(rng.normal(size=(4 * D, D)).astype(np.float32) * .02, DTYPE)
scale = jnp.ones((D,), jnp.float32)
bias = jnp.zeros((D,), jnp.float32)


def ln(x):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    safe = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
    return ((xf - mu) / (std + 1e-5) * scale + bias).astype(x.dtype)


PIECES = {
    # name: step fn taking/returning ef-shaped carry
    "ln_ef": lambda c: ln(c),
    "gathers_2x": lambda c: (jnp.take(nf, senders, axis=0)
                             + jnp.take(nf, receivers, axis=0) + 0 * c[:, :D]),
    "edge_update_full": lambda c: jnp.concatenate(
        [c, jnp.take(nf, senders, axis=0), jnp.take(nf, receivers, axis=0),
         jnp.take(gf, edge_graph, axis=0)], -1) @ W_e,
    "segsum_e2n_bcast": lambda c: jnp.take(
        jax.ops.segment_sum(
            jnp.where(emask[:, None], c, 0).astype(jnp.float32),
            receivers, num_segments=N, indices_are_sorted=False
        ).astype(c.dtype), receivers, axis=0),
    "ff_edges": lambda c: jnp.maximum(c @ W1, 0) @ W2,
    "residual_add": lambda c: c + c,
}


def _edge_update_split(c):
    t_s = nf @ W_e[D:2 * D]
    t_r = nf @ W_e[2 * D:3 * D]
    t_g = gf @ W_e[3 * D:]
    return (c @ W_e[:D] + jnp.take(t_s, senders, axis=0)
            + jnp.take(t_r, receivers, axis=0)
            + jnp.take(t_g, edge_graph, axis=0))


def _segsum_pallas(c):
    from graphnets_tpu.ops.pallas.segment_sum import sorted_segment_sum
    return jnp.take(sorted_segment_sum(c, receivers, N).astype(c.dtype),
                    receivers, axis=0)


PIECES["edge_update_split"] = _edge_update_split
PIECES["segsum_pallas"] = _segsum_pallas


def timed(step):
    """Per-iteration time via two-length in-jit scans, differenced — immune
    to drift in the fixed tunnel overhead (which a separately measured
    baseline is not)."""
    def make(length):
        @jax.jit
        def f(c):
            def body(c, _):
                return step(c).astype(c.dtype), None
            c2, _ = jax.lax.scan(body, c, None, length=length)
            return jnp.sum(c2.astype(jnp.float32))
        return f

    times = {}
    for length in (L // 10, L):
        f = make(length)
        float(f(ef))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(ef))
            best = min(best, time.perf_counter() - t0)
        times[length] = best
    return (times[L] - times[L // 10]) / (L - L // 10)


total = 0.0
for name, step in PIECES.items():
    t = timed(step)
    total += t
    print(f"{name:22s} {t*1e6:8.1f} us", flush=True)
print(f"sum of pieces        {total*1e6:8.1f} us", flush=True)

# full GNCore for comparison
from graphnets_tpu.models.gn_core import GNCore
from graphnets_tpu.graph import GraphsTuple

g = GraphsTuple(
    senders=senders, receivers=receivers, node_graph=node_graph,
    edge_graph=edge_graph,
    n_node=jnp.full((B,), N // B, jnp.int32),
    n_edge=jnp.full((B,), E // B, jnp.int32),
    node_mask=jnp.ones((N,), bool), edge_mask=emask,
    graph_mask=jnp.ones((B,), bool), ef=ef, nf=nf, gf=gf)
core = GNCore((D, D, D))
params = jax.tree_util.tree_map(
    lambda x: x.astype(DTYPE), core.init(jax.random.PRNGKey(0)))


def core_step(c):
    out = core.apply(params, g.with_features(ef=c))
    return out.ef.astype(c.dtype)


t_core = timed(core_step)
print(f"full GNCore          {t_core*1e6:8.1f} us", flush=True)
