#!/usr/bin/env python
"""Fused-FFN training gate A/B (round 5).

Measures the full 3-core training step at D=256 for deg-16 shapes with
the fused-FFN training mode forced ON (all sets), OFF (all composed),
and AUTO (the shipped per-set row gate,
``GNCore._FUSED_FFN_TRAIN_MIN_ROWS``) — the provenance for the gate
constants in ``models/gn_core.py`` (RESULTS.md "per-SET row gate").

Usage: python benchmarks/exp_ffn_train_gate.py [--nodes 4096 16384]
"""

import argparse
import sys
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)

from bench import time_iterated  # noqa: E402
from graphnets_tpu.graph import GraphsTuple  # noqa: E402
from graphnets_tpu.models.gn_core import GNCore, GNCoreList  # noqa: E402
from graphnets_tpu.training.losses import graph_loss_nf_ef  # noqa: E402

DEG, D = 16, 256


def build(N):
    E = N * DEG
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32),
                                jnp.bfloat16)
    g = GraphsTuple(
        senders=jnp.asarray(rng.integers(0, N, size=E).astype(np.int32)),
        receivers=jnp.asarray(np.sort(
            rng.integers(0, N, size=E)).astype(np.int32)),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=mk(E, D), nf=mk(N, D), gf=mk(1, D))
    y = g.with_features(ef=mk(E, D), nf=mk(N, D), gf=None)
    return g, y


def measure(N, min_rows):
    GNCore._FUSED_FFN_TRAIN_MIN_ROWS = min_rows
    g, y = build(N)
    stack = GNCoreList([GNCore((D, D, D)) for _ in range(3)])
    params = stack.init(jax.random.PRNGKey(0))
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)
    from bench import cast_params as cast

    def step(carry):
        p, s, g_, y_ = carry

        def loss_of(pp):
            return graph_loss_nf_ef(
                stack.apply(cast(pp), g_, training=True), y_)

        _, grads = jax.value_and_grad(loss_of)(p)
        up, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, up), s, g_, y_)

    kw = dict(l1=2, l2=10, trials=4) if N * DEG >= (1 << 20) else {}
    return time_iterated(step, (params, opt_state, g, y), **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, nargs="+",
                    default=[4096, 16384])
    args = ap.parse_args()
    shipped = GNCore._FUSED_FFN_TRAIN_MIN_ROWS
    for N in args.nodes:
        for label, min_rows in (("all-fused", 0),
                                ("all-composed", 1 << 62),
                                (f"auto (>= {shipped} rows)", shipped)):
            t = measure(N, min_rows)
            print(f"N={N:6d} E={N*DEG:8d}  {label:24s} "
                  f"{t*1e3:7.2f} ms/step", flush=True)
    GNCore._FUSED_FFN_TRAIN_MIN_ROWS = shipped


if __name__ == "__main__":
    main()
