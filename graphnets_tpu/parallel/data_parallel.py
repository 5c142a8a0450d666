"""Data parallelism over a device mesh.

Strategy (SURVEY.md §2.3): each device owns a *shard* of whole graphs, built
as its own "one big graph" with identical static pad sizes; shards are
stacked on a leading device axis and sharded over the mesh's ``data`` axis.
The model forward is ``vmap``-ed over that axis, so under ``jit`` GSPMD
partitions it one-shard-per-device and inserts the gradient ``psum`` over ICI
automatically — the TPU-native replacement for NCCL all-reduce loops.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import GraphsTuple
from ..nn.core import Module
from ..training.losses import graph_loss_nf_ef
from ..training.train import TrainState

__all__ = ["stack_shards", "shard_batch", "make_dp_train_step",
           "dp_batch_sharding"]


def stack_shards(shards: Sequence[GraphsTuple]) -> GraphsTuple:
    """Stack per-device GraphsTuples (identical pad sizes) on a new leading
    axis.  Node/edge indices stay local to each shard."""
    assert len({(g.num_node_slots, g.num_edge_slots, g.num_graph_slots)
                for g in shards}) == 1, "shards must share pad sizes"
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)


def dp_batch_sharding(mesh: Mesh, axis: str = "data"):
    """Shardings for a stacked batch: leading (device) axis over ``axis``."""
    def spec(x):
        return NamedSharding(mesh, P(axis))
    return spec


def shard_batch(g: GraphsTuple, mesh: Mesh, axis: str = "data"
                ) -> GraphsTuple:
    """Place a stacked batch with its leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), g)


def make_dp_train_step(
    model: Module,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Callable = graph_loss_nf_ef,
    axis: str = "data",
    training: bool = True,
    param_shardings=None,
):
    """Jitted DP step over stacked shards ``x, y`` (leading axis = device).

    Params/opt-state are replicated (or sharded per ``param_shardings`` for
    combined DP+TP over a 2-D mesh); batch is sharded; gradient reduction and
    TP activation collectives are inserted by GSPMD.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def step(state: TrainState, x: GraphsTuple, y: GraphsTuple):
        rng, step_rng = jax.random.split(state.rng)
        num_shards = jax.tree_util.tree_leaves(x)[0].shape[0]

        def loss_of(params):
            def per_shard(shard_idx, xs, ys):
                # Decorrelate stochastic layers (dropout) across shards:
                # each shard folds its index into the step rng, so DP with
                # dropout > 0 draws independent masks per shard.  Contract:
                # the DP step equals a single-device vmap over the same
                # shards with rng = fold_in(step_rng, shard_index)
                # (tested in tests/test_parallel.py).
                shard_rng = jax.random.fold_in(step_rng, shard_idx)
                pred = model.apply(params, xs, training=training,
                                   rng=shard_rng)
                return loss_fn(pred, ys)
            losses = jax.vmap(per_shard)(
                jnp.arange(num_shards, dtype=jnp.uint32), x, y)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, {"loss": loss}

    if param_shardings is None:
        # Replicated params/opt-state; batch sharded on the data axis.
        return jax.jit(step,
                       in_shardings=(repl, shard, shard),
                       out_shardings=(repl, repl))

    # DP + TP: the caller placed params with ``shard_params`` and built the
    # opt state from those placed params (so adamw moments inherit the same
    # shardings).  jit infers in/out shardings from argument placement; we
    # only pin the batch to the data axis.
    return jax.jit(step, in_shardings=(None, shard, shard))
