"""Edge-partitioned FULL-STACK execution and training.

Round-1 covered a single edge-partitioned GNBlock; the north star
(BASELINE.md config 5) is *training* a whole model over a partitioned
graph.  This module runs an entire EncodeProcessDecode — encoder GNBlock,
GNCore stack, decoder GNBlock — inside ONE ``shard_map``, with one halo
``all_to_all`` + one ``psum`` per block (v3 transform-before-exchange,
:func:`..edge_partition.block_local_v3`), plus a train step (masked loss,
grads through the collectives, optax update) equal to the single-device
path.

Why shard-local LN/FF is exact: LayerNorm, FeedForward, and residual adds
are per-row maps (``/root/reference/src/gncore.jl:56-59`` — per-feature-set
LN over channels + per-row MLP), so applying them to each shard's row block
reproduces the unpartitioned values on real rows bit-for-bit; only the
aggregations (segment-sum, graph pools, halo gathers) involve cross-row
data, and those are handled by the partitioned block.

Gradients: parameters enter the ``shard_map`` replicated (``P()``); the
shard_map transpose inserts the ``psum`` over shard-local parameter
cotangents automatically, so ``jax.grad`` through the partitioned stack is
the exact distributed analogue of the single-device gradient.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.encode_process_decode import EncodeProcessDecode
from ..models.gn_core import GNCore
from ..nn.core import FeedForward, LayerNorm
from .edge_partition import HaloPlan, PartitionedGraph, block_local_v3

__all__ = [
    "gn_core_partitioned",
    "gn_core_list_partitioned",
    "encode_process_decode_partitioned",
    "partitioned_loss_nf_ef",
    "make_partitioned_train_step",
    "make_partitioned_core_list_train_step",
]


def _core_local(core: GNCore, params, send_idx, sender_pos, rl, em, nm,
                nf, ef, gf, axis: str, training: bool = False):
    """Per-shard GNCore body: ``y = x + Block(LN1(x)) + FF(LN2(x))``
    (parallel-branch residual, ``/root/reference/src/gncore.jl:56-59``).
    LN/FF/residual are per-row (shard-local); the block body exchanges halos.

    With Pallas on, this runs the SAME fused kernel stack as the
    single-device ``GNCore.apply``: the pre-block edge LayerNorm fuses
    into the edge-update matmul (``ln_matmul`` via ``ef_ln``), and the
    whole second branch + both residuals run as ``ln_ffn_residual`` per
    feature set.  The training-mode fused-FFN dim gate mirrors
    ``GNCore._FUSED_FFN_TRAIN_MAX_DIM`` (the flash-style backward loses to
    XLA above it).
    """
    de, dn, dg = core.dims
    eln, nln, gln = LayerNorm(de), LayerNorm(dn), LayerNorm(dg)
    eff, nff, gff = (FeedForward(de, core.dropout),
                     FeedForward(dn, core.dropout),
                     FeedForward(dg, core.dropout))
    block = core._parts()[0]

    from ..utils.config import use_pallas
    pallas = use_pallas()
    ln1 = params["gn1"]
    if pallas:
        # Edge LN deferred into the edge-update matmul (one HBM pass).
        b_ef, b_nf, b_gf = block_local_v3(
            block, params["block"], send_idx, sender_pos, rl, em, nm,
            nln.apply(ln1["nodeln"], nf), ef,
            gln.apply(ln1["graphln"], gf), axis, ef_ln=ln1["edgeln"],
            training=training)
    else:
        b_ef, b_nf, b_gf = block_local_v3(
            block, params["block"], send_idx, sender_pos, rl, em, nm,
            nln.apply(ln1["nodeln"], nf), eln.apply(ln1["edgeln"], ef),
            gln.apply(ln1["graphln"], gf), axis, training=training)

    ln2, ff = params["gn2"], params["ffwd"]
    use_fused_ffn = (pallas and (core.dropout == 0 or not training)
                     and (not training
                          or de <= GNCore._FUSED_FFN_TRAIN_MAX_DIM))
    if use_fused_ffn:
        from ..ops.pallas.fused_ffn import (ln_ffn_residual,
                                            ln_ffn_residual_reference)

        def one(x, extra, ln_key, ff_key):
            p, f = ln2[ln_key], ff[ff_key]
            fn = ln_ffn_residual
            if (training
                    and x.shape[0] < GNCore._FUSED_FFN_TRAIN_MIN_ROWS):
                # Per-SET row gate, mirroring GNCore._fused_branch2: the
                # kernel's residual fold only pays back at large row
                # counts under training (RESULTS.md r5).  Note rows here
                # are PER SHARD.
                fn = ln_ffn_residual_reference
            return fn(x, p["scale"], p["bias"],
                      f["0"]["w"], f["0"]["b"],
                      f["1"]["w"], f["1"]["b"], extra=extra)

        return (one(ef, b_ef, "edgeln", "eff"),
                one(nf, b_nf, "nodeln", "nff"),
                one(gf, b_gf, "graphln", "gff"))
    f_ef = eff.apply(ff["eff"], eln.apply(ln2["edgeln"], ef))
    f_nf = nff.apply(ff["nff"], nln.apply(ln2["nodeln"], nf))
    f_gf = gff.apply(ff["gff"], gln.apply(ln2["graphln"], gf))
    return ef + b_ef + f_ef, nf + b_nf + f_nf, gf + b_gf + f_gf


def _epd_local(model: EncodeProcessDecode, params, send_idx, sender_pos,
               rl, em, nm, nf, ef, gf, axis: str, training: bool = False):
    """Per-shard EncodeProcessDecode body (whole stack, one shard_map)."""
    enc, cores, dec = model._parts()
    ef, nf, gf = block_local_v3(enc, params["encoder"], send_idx, sender_pos,
                                rl, em, nm, nf, ef, gf, axis,
                                training=training)
    for i, core in enumerate(cores.cores):
        ef, nf, gf = _core_local(core, params["core"][str(i)], send_idx,
                                 sender_pos, rl, em, nm, nf, ef, gf, axis,
                                 training=training)
    return block_local_v3(dec, params["decoder"], send_idx, sender_pos,
                          rl, em, nm, nf, ef, gf, axis, training=training)


def _run_partitioned(local_fn, params, pg: PartitionedGraph, plan: HaloPlan,
                     mesh: Mesh, axis: str, out_dims: Tuple[int, int, int]
                     ) -> PartitionedGraph:
    """Wrap a per-shard stack body in shard_map and repack the outputs."""

    def wrapped(params, send_idx, sender_pos, rl, em, nm, nf, ef, gf):
        h_ef, h_nf, h_gf = local_fn(
            params, send_idx[0], sender_pos[0], rl[0], em[0], nm[0], nf[0],
            ef[0] if ef is not None else None, gf)
        return h_ef[None], h_nf[None], h_gf

    shard, repl = P(axis), P()
    fn = jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(repl, shard, shard, shard, shard, shard, shard,
                  shard if pg.ef is not None else repl, repl),
        out_specs=(shard, shard, repl),
        check_vma=False,
    )
    h_ef, h_nf, h_gf = fn(params, plan.send_idx, plan.sender_pos,
                          pg.receivers_local, pg.edge_mask, pg.node_mask,
                          pg.nf, pg.ef, pg.gf)
    de_o, dn_o, dg_o = out_dims
    return pg.replace(ef=h_ef if de_o > 0 else None, nf=h_nf,
                      gf=h_gf if dg_o > 0 else None)


def gn_core_partitioned(core: GNCore, params, pg: PartitionedGraph,
                        plan: HaloPlan, mesh: Mesh, axis: str = "graph"
                        ) -> PartitionedGraph:
    """One edge-partitioned GNCore (LN/FF shard-local + partitioned block);
    == the unpartitioned :class:`..models.gn_core.GNCore` on real slots."""

    def local(params, send_idx, sender_pos, rl, em, nm, nf, ef, gf):
        return _core_local(core, params, send_idx, sender_pos, rl, em, nm,
                           nf, ef, gf, axis)

    return _run_partitioned(local, params, pg, plan, mesh, axis, core.dims)


def gn_core_list_partitioned(cores, params, pg: PartitionedGraph,
                             plan: HaloPlan, mesh: Mesh,
                             axis: str = "graph", training: bool = False
                             ) -> PartitionedGraph:
    """A GNCoreList over an edge-partitioned graph in ONE ``shard_map`` —
    the partitioned counterpart of the headline 3-core stack
    (``bench.py``), same kernel engagement as :func:`gn_core_partitioned`.
    ``cores``: a ``GNCoreList`` (or any object with ``.cores``)."""

    def local(params, send_idx, sender_pos, rl, em, nm, nf, ef, gf):
        for i, core in enumerate(cores.cores):
            ef, nf, gf = _core_local(core, params[str(i)], send_idx,
                                     sender_pos, rl, em, nm, nf, ef, gf,
                                     axis, training=training)
        return ef, nf, gf

    return _run_partitioned(local, params, pg, plan, mesh, axis,
                            cores.cores[-1].dims)


def make_partitioned_core_list_train_step(cores, optimizer, plan: HaloPlan,
                                          mesh: Mesh, axis: str = "graph",
                                          loss_fn: Optional[Callable] = None):
    """Jittable train step for a partitioned GNCoreList (mirrors
    :func:`make_partitioned_train_step`)."""
    loss_fn = loss_fn or partitioned_loss_nf_ef

    def step(state, pg: PartitionedGraph, y_nf, y_ef):
        def loss_of(params):
            pred = gn_core_list_partitioned(cores, params, pg, plan, mesh,
                                            axis, training=True)
            return loss_fn(pred, y_nf, y_ef), pred

        (loss, _), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        return dataclasses.replace(
            state, params=params, opt_state=opt_state,
            step=state.step + 1), {"loss": loss}

    return step


def encode_process_decode_partitioned(
        model: EncodeProcessDecode, params, pg: PartitionedGraph,
        plan: HaloPlan, mesh: Mesh, axis: str = "graph",
        training: bool = False) -> PartitionedGraph:
    """Full EncodeProcessDecode over an edge-partitioned graph, one
    ``shard_map`` for the entire stack — the trainable counterpart of the
    reference's example model (``/root/reference/examples/sort/sort.jl:51-81``)
    at single-graph scales its dense design cannot represent."""

    def local(params, send_idx, sender_pos, rl, em, nm, nf, ef, gf):
        return _epd_local(model, params, send_idx, sender_pos, rl, em, nm,
                          nf, ef, gf, axis, training=training)

    return _run_partitioned(local, params, pg, plan, mesh, axis,
                            model.y_dims)


def _masked_ce(logits, targets, mask):
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_row = -jnp.sum(targets.astype(jnp.float32) * logz, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def partitioned_loss_nf_ef(pred: PartitionedGraph, y_nf: jax.Array,
                           y_ef: jax.Array) -> jax.Array:
    """Node-CE + edge-CE masked to real slots, over the shard-stacked
    ``[S, ...]`` layout — the partitioned form of
    ``training.losses.graph_loss_nf_ef`` (same masked-mean semantics as the
    reference loss, ``/root/reference/examples/sort/sort.jl:76-78``).

    Computed on the shard_map OUTPUTS (global arrays), so jit/GSPMD keeps
    the reduction sharded; gradients flow back through the stack's
    collectives.
    """
    loss = _masked_ce(pred.nf.reshape(-1, pred.nf.shape[-1]),
                      y_nf.reshape(-1, y_nf.shape[-1]),
                      pred.node_mask.reshape(-1))
    loss += _masked_ce(pred.ef.reshape(-1, pred.ef.shape[-1]),
                       y_ef.reshape(-1, y_ef.shape[-1]),
                       pred.edge_mask.reshape(-1))
    return loss


def make_partitioned_train_step(model: EncodeProcessDecode, optimizer,
                                plan: HaloPlan, mesh: Mesh,
                                axis: str = "graph",
                                loss_fn: Optional[Callable] = None):
    """Jittable ``(state, pg, y_nf, y_ef) -> (state, metrics)`` training step
    over an edge-partitioned graph.

    ``y_nf [S, Npad, C]`` / ``y_ef [S, Epad, C]`` are shard-stacked targets
    (same layout as ``pg.nf`` / ``pg.ef``).  Equality with the single-device
    ``training.train.make_train_step`` is asserted in
    ``tests/test_parallel.py``.
    """
    loss_fn = loss_fn or partitioned_loss_nf_ef

    def step(state, pg: PartitionedGraph, y_nf, y_ef):
        def loss_of(params):
            pred = encode_process_decode_partitioned(
                model, params, pg, plan, mesh, axis, training=True)
            return loss_fn(pred, y_nf, y_ef), pred

        (loss, pred), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        metrics = {"loss": loss}
        return dataclasses.replace(
            state, params=params, opt_state=opt_state,
            step=state.step + 1), metrics

    return step
