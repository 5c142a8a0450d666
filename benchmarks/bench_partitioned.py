#!/usr/bin/env python
"""Partitioned-path overhead at S=1 on the real chip (round-4 ask #1).

The round-3 verdict's top item: the multi-chip (edge-partitioned) path
must run the SAME kernel stack as the single-chip path, measured — not
just be correct.  This benchmark runs the headline-shaped workload as ONE
big graph (N=1024, E=16384, deg 16, dims (384,384,384), 3 GNCores, bf16
activations / f32 params) through:

  1. the unpartitioned single-device stack (split-linear + Pallas
     sorted-gather / sorted segment-sum / ln_matmul / fused-FFN), and
  2. the edge-partitioned stack on a 1-device mesh (shard_map), which
     after round 4 engages the same kernels inside the shard body,

for both forward and a full AdamW train step.  Done-criterion: the S=1
partitioned step within ~10% of the unpartitioned one — i.e. the scaling
model's per-chip compute denominator is the REAL single-chip rate.

Timing: the honest in-jit lax.scan harness (bench.time_iterated).
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from graphnets_tpu.graph import GraphsTuple
from graphnets_tpu.models.gn_core import GNCore, GNCoreList
from graphnets_tpu.parallel.edge_partition import (build_halo_plan,
                                                   partition_edges)
from graphnets_tpu.parallel.edge_partition_stack import (
    gn_core_list_partitioned, partitioned_loss_nf_ef)
from graphnets_tpu.parallel.mesh import make_mesh
from graphnets_tpu.training.losses import graph_loss_nf_ef
from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

import bench  # repo-root harness

enable_compilation_cache()
enable_pallas(True)

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--large", action="store_true",
                 help="BASELINE config-5 class shape (N=65536, E=1M, "
                 "D=256) instead of the headline shape — round-5 ask #3: "
                 "measure the partitioned rate on the shape the scaling "
                 "table's large rows describe")
_ap.add_argument("--skip-train", action="store_true")
_args, _ = _ap.parse_known_args()

if _args.large:
    N, DEG, D = 65536, 16, 256
else:
    N, DEG, D = 1024, 16, 384
E = N * DEG
DTYPE = jnp.bfloat16


def build_single_graph(seed=0):
    rng = np.random.default_rng(seed)
    receivers = np.repeat(np.arange(N), DEG)      # canonical: sorted
    senders = np.concatenate(
        [rng.choice(N, size=DEG, replace=False) for _ in range(N)])
    ef = rng.normal(size=(E, D)).astype(np.float32)
    nf = rng.normal(size=(N, D)).astype(np.float32)
    gf = rng.normal(size=(D,)).astype(np.float32)
    return senders.astype(np.int64), receivers.astype(np.int64), ef, nf, gf


def main():
    senders, receivers, ef, nf, gf = build_single_graph()
    stack = GNCoreList([GNCore((D, D, D)) for _ in range(3)])
    params = stack.init(jax.random.PRNGKey(0))

    def cast(p):
        return jax.tree_util.tree_map(lambda x: x.astype(DTYPE), p)

    # ---- unpartitioned single-graph GraphsTuple (canonical order) -------
    g = GraphsTuple(
        senders=jnp.asarray(senders, jnp.int32),
        receivers=jnp.asarray(receivers, jnp.int32),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=jnp.asarray(ef, DTYPE), nf=jnp.asarray(nf, DTYPE),
        gf=jnp.asarray(gf, DTYPE)[None])

    # ---- partitioned S=1 ------------------------------------------------
    mesh = make_mesh((1,), ("graph",))
    pg = partition_edges(senders, receivers, nf, num_shards=1, ef=ef, gf=gf)
    pg = pg.replace(ef=pg.ef.astype(DTYPE), nf=pg.nf.astype(DTYPE),
                    gf=pg.gf.astype(DTYPE))
    plan = build_halo_plan(pg)

    params_b = cast(params)

    # ---- forward --------------------------------------------------------
    _tkw = dict(l1=2, l2=10, trials=4) if _args.large else {}
    t_unpart = bench.time_iterated(lambda x: stack.apply(params_b, x), g,
                                   **_tkw)
    print(f"# unpartitioned fwd: {t_unpart*1e3:.2f} ms "
          f"({E / t_unpart:.3e} edges/s)", file=sys.stderr, flush=True)

    t_part = bench.time_iterated(
        lambda x: gn_core_list_partitioned(stack, params_b, x, plan, mesh),
        pg, **_tkw)
    print(f"# partitioned S=1 fwd: {t_part*1e3:.2f} ms "
          f"(overhead {t_part / t_unpart - 1:+.1%})", file=sys.stderr,
          flush=True)

    # ---- train step (AdamW, bf16 activations / f32 params) --------------
    rng = np.random.default_rng(1)
    y_ef = rng.normal(size=(E, D)).astype(np.float32)
    y_nf = rng.normal(size=(N, D)).astype(np.float32)
    y = g.with_features(ef=jnp.asarray(y_ef, DTYPE),
                        nf=jnp.asarray(y_nf, DTYPE), gf=None)
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    # graph + targets ride in the CARRY (jit inputs), not as closure
    # constants — constants are baked into the serialized HLO and stall
    # the tunnel's remote compile at the --large shape (~1.6 GB).
    def step_unpart(carry):
        p, s, g, y = carry

        def loss_of(p):
            pred = stack.apply(cast(p), g, training=True)
            return graph_loss_nf_ef(pred, y)

        loss, grads = jax.value_and_grad(loss_of)(p)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, g, y)

    if _args.skip_train:
        import json
        print(json.dumps({
            "shape": {"N": N, "E": E, "D": D},
            "unpart_fwd_ms": t_unpart * 1e3,
            "part_s1_fwd_ms": t_part * 1e3,
            "fwd_overhead": t_part / t_unpart - 1,
        }))
        return

    t_unpart_tr = bench.time_iterated(step_unpart,
                                      (params, opt_state, g, y), **_tkw)
    print(f"# unpartitioned train: {t_unpart_tr*1e3:.2f} ms",
          file=sys.stderr, flush=True)

    # Shard-stacked targets via the same deterministic partitioner.
    pg_y = partition_edges(senders, receivers, y_nf, num_shards=1, ef=y_ef)
    yp_nf = pg_y.nf.astype(DTYPE)
    yp_ef = pg_y.ef.astype(DTYPE)

    def step_part(carry):
        p, s, pg_c, ynf, yef = carry

        def loss_of(p):
            pred = gn_core_list_partitioned(stack, cast(p), pg_c, plan,
                                            mesh, training=True)
            return partitioned_loss_nf_ef(pred, ynf, yef)

        loss, grads = jax.value_and_grad(loss_of)(p)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, pg_c, ynf, yef)

    t_part_tr = bench.time_iterated(
        step_part, (params, opt_state, pg, yp_nf, yp_ef), **_tkw)
    print(f"# partitioned S=1 train: {t_part_tr*1e3:.2f} ms "
          f"(overhead {t_part_tr / t_unpart_tr - 1:+.1%})", file=sys.stderr,
          flush=True)

    import json
    print(json.dumps({
        "shape": {"N": N, "E": E, "D": D},
        "unpart_fwd_ms": t_unpart * 1e3,
        "part_s1_fwd_ms": t_part * 1e3,
        "fwd_overhead": t_part / t_unpart - 1,
        "unpart_train_ms": t_unpart_tr * 1e3,
        "part_s1_train_ms": t_part_tr * 1e3,
        "train_overhead": t_part_tr / t_unpart_tr - 1,
    }))


if __name__ == "__main__":
    main()
