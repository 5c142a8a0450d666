"""Edge-partitioned graph parallelism — sharding ONE large graph across chips.

This is the framework's analogue of sequence/context parallelism (SURVEY.md
§2.3, §5): the reference caps graphs at tiny sizes because of its dense PN^2
edge space; here a single huge graph's edges are partitioned across the
mesh's ``graph`` axis and each layer exchanges boundary (halo) node features
over ICI.

Partition strategy (v1):

* Nodes are assigned to shards in contiguous blocks (balanced counts).
* Each edge lives on the shard that **owns its receiver**, so the
  edge->node ``segment_sum`` is entirely local (no communication on the
  scatter side).
* Sender features may live on remote shards: the edge update first
  ``all_gather``-s node features over the axis (rides ICI), then gathers
  senders by global id.  (v2: ppermute halo exchange of only boundary nodes,
  overlapped with local aggregation.)
* Graph-level aggregation is a local partial sum + ``psum`` over the axis;
  the global update then computes identically on every shard (replicated).

All of this runs inside ``shard_map`` over a ``Mesh`` axis; collectives are
XLA ``all_gather``/``psum`` over ICI — the TPU-native replacement for the
NCCL/MPI layer the reference never had.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import GraphsTuple
from ..models.gn_block import GNBlock
from ..models import gn_block as _gnb
from ..nn.core import Linear
from ..ops import scatter

__all__ = ["partition_edges", "PartitionedGraph", "gn_block_partitioned",
           "gn_block_partitioned_overlap", "gather_remote_node_features",
           "block_local_v3"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PartitionedGraph:
    """One big graph, edge-partitioned over ``S`` shards.

    Arrays carry a leading shard axis ``[S, ...]``:

    * ``senders_global [S, Epad]``: global node id of each local edge's
      source (may be remote).
    * ``receivers_local [S, Epad]``: shard-local node index of the dest.
    * ``edge_mask [S, Epad]``, ``node_mask [S, Npad]``.
    * ``nf [S, Npad, DN]``: shard-local node features (contiguous global
      blocks: shard s owns global nodes ``[s*Npad, s*Npad + Npad)``).
    * ``ef [S, Epad, DE]`` optional edge features.
    * ``gf [1, DG]`` optional single-graph global features (replicated).
    """

    senders_global: jax.Array
    receivers_local: jax.Array
    edge_mask: jax.Array
    node_mask: jax.Array
    nf: jax.Array
    ef: Optional[jax.Array] = None
    gf: Optional[jax.Array] = None
    # Host-side metadata (NOT part of the pytree; lost under tree_map/jit):
    # original edge index of each local slot ``[S, Epad]`` (pad = -1).
    # Each shard's edges are SORTED by local receiver (the canonical order
    # the Pallas sorted segment-sum/gather kernels require); this maps a
    # shard slot back to the caller's edge array.
    edge_index: Optional[np.ndarray] = None

    _children = ("senders_global", "receivers_local", "edge_mask",
                 "node_mask", "nf", "ef", "gf")

    def tree_flatten(self):
        return tuple(getattr(self, k) for k in self._children), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_shards(self) -> int:
        return int(self.senders_global.shape[0])

    @property
    def nodes_per_shard(self) -> int:
        return int(self.nf.shape[1])

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def partition_edges(senders: np.ndarray, receivers: np.ndarray,
                    nf: np.ndarray, num_shards: int,
                    ef: Optional[np.ndarray] = None,
                    gf: Optional[np.ndarray] = None,
                    edge_pad_multiple: int = 128) -> PartitionedGraph:
    """Host-side partitioner: contiguous node blocks, edges to the receiver's
    owner shard, equal static pad sizes across shards.

    Each shard's edges are stably SORTED by local receiver, and padded
    slots target the virtual overflow segment ``npad`` — the
    sorted-pad-safe contract the Pallas sorted segment-sum / gather
    kernels require (``ops/pallas/segment_sum.py``), so the partitioned
    path runs the same kernel stack as the single-device block.
    ``pg.edge_index`` maps each local slot back to the input edge array.
    """
    N = nf.shape[0]
    npad = -(-N // num_shards)
    owner = np.minimum(receivers // npad, num_shards - 1)
    # receivers < num_shards*npad by construction since npad*num_shards >= N
    counts = np.bincount(owner, minlength=num_shards)
    epad = int(-(-counts.max() // edge_pad_multiple) * edge_pad_multiple)

    S = num_shards
    sg = np.zeros((S, epad), np.int32)
    rl = np.full((S, epad), npad, np.int32)   # pads -> overflow segment
    em = np.zeros((S, epad), bool)
    eidx = np.full((S, epad), -1, np.int64)
    nm = np.zeros((S, npad), bool)
    nfp = np.zeros((S, npad, nf.shape[1]), np.float32)
    efp = (np.zeros((S, epad, ef.shape[1]), np.float32)
           if ef is not None else None)
    for s in range(S):
        sel = np.where(owner == s)[0]
        rls = receivers[sel] - s * npad
        sel = sel[np.argsort(rls, kind="stable")]  # canonical sorted order
        k = len(sel)
        sg[s, :k] = senders[sel]
        rl[s, :k] = receivers[sel] - s * npad
        em[s, :k] = True
        eidx[s, :k] = sel
        lo, hi = s * npad, min((s + 1) * npad, N)
        nm[s, : hi - lo] = True
        nfp[s, : hi - lo] = nf[lo:hi]
        if ef is not None:
            efp[s, :k] = ef[sel]
    return PartitionedGraph(
        senders_global=jnp.asarray(sg), receivers_local=jnp.asarray(rl),
        edge_mask=jnp.asarray(em), node_mask=jnp.asarray(nm),
        nf=jnp.asarray(nfp),
        ef=jnp.asarray(efp) if efp is not None else None,
        gf=jnp.asarray(gf[None, :].astype(np.float32))
        if gf is not None else None,
        edge_index=eidx,
    )


def gather_remote_node_features(nf_local: jax.Array, global_idx: jax.Array,
                                axis: str) -> jax.Array:
    """All-gather node features over the mesh axis, then gather by global id.

    v1 halo exchange: full all_gather over ICI.  ``nf_local: [Npad, DN]``
    (this shard's block), ``global_idx: [Epad]`` global node ids.
    """
    all_nf = jax.lax.all_gather(nf_local, axis, tiled=True)  # [S*Npad, DN]
    return jnp.take(all_nf, global_idx, axis=0, mode="clip")


def gn_block_partitioned(block: GNBlock, params, pg: PartitionedGraph,
                         mesh: Mesh, axis: str = "graph") -> PartitionedGraph:
    """Apply a GNBlock to an edge-partitioned single graph via ``shard_map``.

    Semantics identical to the unpartitioned block on the whole graph
    (verified in tests against the single-device path); communication is one
    ``all_gather`` (sender halo) + one ``psum`` (global aggregation) per
    layer, both over ICI.
    """
    edgefn, nodefn, graphfn = block._nets()
    de, dn, dg = block.in_dims

    def local(params, sg, rl, em, nm, nf, ef, gf):
        # shard_map leaves the sharded leading axis as size 1 — squeeze it.
        sg, rl, em, nm, nf = sg[0], rl[0], em[0], nm[0], nf[0]
        ef = ef[0] if ef is not None else None
        Epad, Npad = sg.shape[0], nf.shape[0]
        ef = ef if ef is not None else jnp.zeros((Epad, 0), nf.dtype)
        gf = gf if gf is not None else jnp.zeros((1, 0), nf.dtype)

        # -- edge update: remote sender halo + local receiver gather --------
        src = gather_remote_node_features(nf, sg, axis)
        dst = jnp.take(nf, rl, axis=0, mode="clip")
        g2e = jnp.broadcast_to(gf[0], (Epad, gf.shape[1]))
        edge_in = jnp.concatenate([ef, src, dst, g2e], axis=-1)
        h_ef = edgefn.apply(params["edgefn"], edge_in)

        # -- node update: local segment_sum (edges live with receivers;
        # shard edge order is receiver-sorted, pads target segment Npad
        # and are dropped as out-of-range) --------------------------------
        agg = scatter.segment_sum(h_ef, rl, Npad, em,
                                  indices_are_sorted=True)
        g2n = jnp.broadcast_to(gf[0], (Npad, gf.shape[1]))
        node_in = jnp.concatenate([agg, nf, g2n], axis=-1)
        h_nf = nodefn.apply(params["nodefn"], node_in)

        # -- global update: partial pools + psum, replicated compute --------
        e_pool = jnp.sum(jnp.where(em[:, None], h_ef, 0.0), axis=0)
        n_pool = jnp.sum(jnp.where(nm[:, None], h_nf, 0.0), axis=0)
        pools = jax.lax.psum(jnp.concatenate([e_pool, n_pool]), axis)
        graph_in = jnp.concatenate([pools, gf[0]])[None, :]
        h_gf = graphfn.apply(params["graphfn"], graph_in)
        # Restore the size-1 shard axis for sharded outputs.
        return h_ef[None], h_nf[None], h_gf

    shard = P(axis)
    repl = P()
    in_specs = (repl, shard, shard, shard, shard, shard,
                shard if pg.ef is not None else repl,
                repl)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=(shard, shard, repl),
        check_vma=False,
    )
    h_ef, h_nf, h_gf = fn(params, pg.senders_global, pg.receivers_local,
                          pg.edge_mask, pg.node_mask, pg.nf, pg.ef, pg.gf)
    de_o, dn_o, dg_o = block.out_dims
    return pg.replace(
        ef=h_ef if de_o > 0 else None,
        nf=h_nf,
        gf=h_gf if dg_o > 0 else None,
    )


# ---------------------------------------------------------------------------
# v2 halo exchange: all-to-all of only the boundary node features
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HaloPlan:
    """Static exchange plan for boundary node features.

    Built host-side from the edge partition.  Per shard ``s``:

    * ``send_idx[s, t, H]``: local indices of the rows shard ``s`` must send
      to peer ``t`` (the senders of t's edges that live on s), padded with 0
      and masked by ``send_mask``.
    * ``sender_pos[s, Epad]``: for every local edge, the position of its
      sender's features in the concatenation ``[local nf (Npad) | halo
      buffer (S*H)]`` — local senders map below ``Npad``, remote senders map
      into the slot where the all-to-all deposits them.

    Communication per layer: ``2 * H * S * D`` bytes per chip (an
    ``all_to_all``), vs ``(S-1) * Npad * D`` for the v1 all-gather — a win
    whenever the boundary set is smaller than the full node set (i.e. the
    partition has locality).
    """

    send_idx: jax.Array   # [S, S, H] int32
    send_mask: jax.Array  # [S, S, H] bool
    sender_pos: jax.Array  # [S, Epad] int32

    def tree_flatten(self):
        return (self.send_idx, self.send_mask, self.sender_pos), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def halo_size(self) -> int:
        return int(self.send_idx.shape[2])


def build_halo_plan(pg: PartitionedGraph, halo_pad_multiple: int = 8
                    ) -> HaloPlan:
    """Host-side construction of the boundary-exchange plan."""
    S = pg.num_shards
    npad = pg.nodes_per_shard
    sg = np.asarray(pg.senders_global)
    em = np.asarray(pg.edge_mask)
    Epad = sg.shape[1]

    # needed[s][t] = sorted unique global sender ids shard s needs from t
    needed = [[None] * S for _ in range(S)]
    H = 1
    for s in range(S):
        owners = np.minimum(sg[s] // npad, S - 1)
        for t in range(S):
            ids = np.unique(sg[s][(owners == t) & em[s] & (t != s)])
            needed[s][t] = ids
            H = max(H, len(ids))
    H = int(-(-H // halo_pad_multiple) * halo_pad_multiple)

    send_idx = np.zeros((S, S, H), np.int32)
    send_mask = np.zeros((S, S, H), bool)
    for s in range(S):
        for t in range(S):
            ids = needed[t][s]  # what t needs FROM s -> s sends these
            send_idx[s, t, : len(ids)] = ids - s * npad
            send_mask[s, t, : len(ids)] = True

    sender_pos = np.zeros((S, Epad), np.int32)
    for s in range(S):
        owners = np.minimum(sg[s] // npad, S - 1)
        pos = np.zeros(Epad, np.int64)
        local = owners == s
        pos[local] = sg[s][local] - s * npad
        for t in range(S):
            if t == s:
                continue
            sel = (owners == t) & em[s]
            if not sel.any():
                continue
            # after all_to_all, rows from peer t sit at [npad + t*H, ...)
            slot = np.searchsorted(needed[s][t], sg[s][sel])
            pos[sel] = npad + t * H + slot
        sender_pos[s] = pos
    return HaloPlan(send_idx=jnp.asarray(send_idx),
                    send_mask=jnp.asarray(send_mask),
                    sender_pos=jnp.asarray(sender_pos))


def gn_block_partitioned_halo(block: GNBlock, params, pg: PartitionedGraph,
                              plan: HaloPlan, mesh: Mesh,
                              axis: str = "graph") -> PartitionedGraph:
    """Edge-partitioned GNBlock with all-to-all boundary exchange (v2).

    Identical semantics to :func:`gn_block_partitioned`; communication is
    the boundary set only.  The all-to-all is issued before the local edge
    feature assembly so XLA can overlap it with independent local work.
    """
    edgefn, nodefn, graphfn = block._nets()

    def local(params, send_idx, send_mask, sender_pos, rl, em, nm, nf, ef,
              gf):
        send_idx, send_mask, sender_pos = (send_idx[0], send_mask[0],
                                           sender_pos[0])
        rl, em, nm, nf = rl[0], em[0], nm[0], nf[0]
        ef = ef[0] if ef is not None else None
        Epad, Npad = rl.shape[0], nf.shape[0]
        ef = ef if ef is not None else jnp.zeros((Epad, 0), nf.dtype)
        gf = gf if gf is not None else jnp.zeros((1, 0), nf.dtype)
        S, H = send_idx.shape[0], send_idx.shape[1]

        # -- boundary exchange: rows each peer needs from us ----------------
        outgoing = jnp.take(nf, send_idx.reshape(-1), axis=0,
                            mode="clip").reshape(S, H, -1)
        halo = jax.lax.all_to_all(outgoing, axis, split_axis=0,
                                  concat_axis=0, tiled=False)  # [S, H, D]
        table = jnp.concatenate([nf, halo.reshape(S * H, -1)], axis=0)

        # -- edge update ----------------------------------------------------
        src = jnp.take(table, sender_pos, axis=0, mode="clip")
        dst = jnp.take(nf, rl, axis=0, mode="clip")
        g2e = jnp.broadcast_to(gf[0], (Epad, gf.shape[1]))
        h_ef = edgefn.apply(params["edgefn"],
                            jnp.concatenate([ef, src, dst, g2e], -1))

        # -- node update: local segment_sum (receiver-sorted shard order) ---
        agg = scatter.segment_sum(h_ef, rl, Npad, em,
                                  indices_are_sorted=True)
        g2n = jnp.broadcast_to(gf[0], (Npad, gf.shape[1]))
        h_nf = nodefn.apply(params["nodefn"],
                            jnp.concatenate([agg, nf, g2n], -1))

        # -- global update --------------------------------------------------
        e_pool = jnp.sum(jnp.where(em[:, None], h_ef, 0.0), axis=0)
        n_pool = jnp.sum(jnp.where(nm[:, None], h_nf, 0.0), axis=0)
        pools = jax.lax.psum(jnp.concatenate([e_pool, n_pool]), axis)
        h_gf = graphfn.apply(params["graphfn"],
                             jnp.concatenate([pools, gf[0]])[None, :])
        return h_ef[None], h_nf[None], h_gf

    shard = P(axis)
    repl = P()
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(repl, shard, shard, shard, shard, shard, shard, shard,
                  shard if pg.ef is not None else repl, repl),
        out_specs=(shard, shard, repl),
        check_vma=False,
    )
    h_ef, h_nf, h_gf = fn(params, plan.send_idx, plan.send_mask,
                          plan.sender_pos, pg.receivers_local, pg.edge_mask,
                          pg.node_mask, pg.nf, pg.ef, pg.gf)
    de_o, dn_o, dg_o = block.out_dims
    return pg.replace(
        ef=h_ef if de_o > 0 else None,
        nf=h_nf,
        gf=h_gf if dg_o > 0 else None,
    )


# ---------------------------------------------------------------------------
# v3: transform-before-exchange (split-weight halo, comm/compute overlap)
# ---------------------------------------------------------------------------


def block_local_v3(block: GNBlock, params, send_idx, sender_pos, rl, em, nm,
                   nf, ef, gf, axis: str, ef_ln=None,
                   training: bool = False):
    """Per-shard GNBlock body with v3 (transform-before-exchange) halo.

    Runs INSIDE ``shard_map``: all array arguments are this shard's slices
    without a leading shard axis (``ef``/``gf`` may be None or zero-width).
    Returns ``(h_ef, h_nf, h_gf)`` with ``h_gf`` replicated across shards
    (it is computed from psum'd pools, identically everywhere).  This is the
    building block for partitioned GNCores and full stacks — semantics equal
    to the unpartitioned GNBlock on real slots.

    The partitioner emits each shard's edges SORTED by local receiver with
    pads targeting the overflow segment ``Npad``, so this body runs the
    same Pallas kernel stack as the single-device block (sorted-gather
    fused-addend receiver term, sorted segment-sum aggregation, and — via
    ``ef_ln`` — the pre-block edge LayerNorm fused into the edge-update
    matmul).  Pure-XLA fallbacks engage per-shape/backend exactly like the
    single-device path, so CPU virtual-mesh equality tests exercise the
    same code.

    ``ef_ln``: optional LayerNorm params for ``ef`` (the GNCore's
    pre-block edge GraphNorm), applied before the edge update — fused into
    the edge matmul via ``ln_matmul`` when Pallas is on.
    """
    from ..utils.config import use_pallas
    _, nodefn, graphfn = block._nets()
    de, dn, dg = block.in_dims
    de_o = block.out_dims[0]
    assert dn > 0, "transform-before-exchange needs node features"
    Epad, Npad = rl.shape[0], nf.shape[0]
    ef = ef if ef is not None else jnp.zeros((Epad, 0), nf.dtype)
    gf = gf if gf is not None else jnp.zeros((1, 0), nf.dtype)
    S, H = send_idx.shape[0], send_idx.shape[1]

    if ef_ln is not None and not (use_pallas() and de > 0):
        from ..nn.core import LayerNorm
        ef = LayerNorm(de).apply(ef_ln, ef)
        ef_ln = None

    w = params["edgefn"]["w"]
    b = params["edgefn"].get("b")
    w_ef = jax.lax.slice_in_dim(w, 0, de, axis=0)
    w_src = jax.lax.slice_in_dim(w, de, de + dn, axis=0)
    w_dst = jax.lax.slice_in_dim(w, de + dn, de + 2 * dn, axis=0)
    w_g = jax.lax.slice_in_dim(w, de + 2 * dn, de + 2 * dn + dg, axis=0)

    def dot32(x, ws):
        return jax.lax.dot_general(
            x, ws.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # -- sender term: transform locally, exchange transformed rows ------
    t_src = dot32(nf, w_src).astype(nf.dtype)          # [Npad, DE']
    outgoing = jnp.take(t_src, send_idx.reshape(-1), axis=0,
                        mode="clip").reshape(S, H, de_o)
    halo = jax.lax.all_to_all(outgoing, axis, split_axis=0,
                              concat_axis=0, tiled=False)
    table = jnp.concatenate([t_src, halo.reshape(S * H, de_o)], axis=0)

    t_dst = dot32(nf, w_dst).astype(nf.dtype)

    # Fully-fused path: the single-device G=1 kernel with in-kernel
    # segment sum (edge_update_g1) — LN(ef) @ W + sender addend + sorted
    # receiver-window gather + edge->node aggregation in ONE pass.  Pads
    # (rl == Npad) target appended zero table rows >= Npad whose agg rows
    # are sliced off: the overflow-segment contract, unchanged.
    h_ef = agg = None
    # Same training gate as the single-device G=1 path: the agg fusion's
    # backward differs, so GRAPHNETS_TPU_G1_AGG_TRAIN=0 must disable it
    # here too (measured default ON; the composed per-shard path loses
    # big here — 220.45 vs 177.05 ms at E=1M/D=256 S=1, r5b — because
    # the overflow-segment layout keeps the saved [E, dout] re-read
    # load-bearing).
    from ..utils.config import g1_agg_fusion_training
    if (use_pallas() and de > 0
            and (not training or g1_agg_fusion_training())):
        from ..ops.pallas.edge_update_g1 import (
            fused_g1_edge_update_agg, supports_g1_edge_update)
        pad_rows = (32 - Npad % 32) or 32           # >= 1 overflow row
        N2 = Npad + pad_rows
        if supports_g1_edge_update(Epad, N2, de, de_o,
                                   ef.dtype.itemsize, with_agg=True,
                                   part_itemsize=t_dst.dtype.itemsize):
            tr2 = jnp.concatenate(
                [t_dst, jnp.zeros((pad_rows, de_o), t_dst.dtype)], axis=0)
            gb = jnp.zeros((de_o,), jnp.float32)
            if dg > 0:
                gb = gb + dot32(gf, w_g)[0]
            if b is not None:
                gb = gb + b.astype(jnp.float32)
            src_term = scatter.take_rows_sorted_grad(table, sender_pos)
            h_ef, agg_full = fused_g1_edge_update_agg(
                ef, ef_ln, w_ef, src_term, tr2, rl, gb)
            h_ef = h_ef.astype(nf.dtype)
            agg = agg_full[:Npad].astype(nf.dtype)

    if h_ef is None:
        # Composed path (small dims / CPU virtual mesh / unsupported
        # shapes) — same rounding points as the fused kernel.
        # Sender gather: ids unsorted, but the backward scatter runs
        # sorted (argsort once) instead of as an XLA serial scatter.
        acc = scatter.take_rows_sorted_grad(table, sender_pos) \
            .astype(jnp.float32)
        if dg > 0:
            acc = acc + dot32(gf, w_g)[0]              # broadcast [DE']
        if b is not None:
            acc = acc + b.astype(jnp.float32)

        # Receiver term: rl ascending (canonical shard order) -> the
        # Pallas sorted-gather with fused addend; pads (rl == Npad) clamp
        # in range, their rows are garbage-but-masked like the
        # single-device layout.
        rl_g = jnp.minimum(rl, Npad - 1)
        fused_dst = False
        if use_pallas():
            from ..ops.pallas.gather import (sorted_gather_add,
                                             supports_sorted_gather)
            if supports_sorted_gather(Epad, Npad, de_o,
                                      t_dst.dtype.itemsize):
                acc = sorted_gather_add(t_dst, rl_g, acc)
                fused_dst = True
        if not fused_dst:
            acc = acc + scatter.take_rows_sorted_grad(
                t_dst, rl_g, idx_sorted=True).astype(jnp.float32)

        # ef term completes the row — LN fused into the matmul when
        # requested.
        if de > 0 and ef_ln is not None:
            from ..ops.pallas.ln_linear import ln_matmul
            h_ef = ln_matmul(ef, ef_ln["scale"], ef_ln["bias"], w_ef,
                             addend=acc).astype(nf.dtype)
        elif de > 0:
            h_ef = (dot32(ef, w_ef) + acc).astype(nf.dtype)
        else:
            h_ef = acc.astype(nf.dtype)

        # -- node update: local segment_sum (edges live with receivers) -
        # rl is ascending with pads at Npad (the overflow segment, sliced
        # off), so the mask-free sorted kernel applies — the same
        # contract as the single-device canonical layout.
        agg = scatter.segment_sum(h_ef, rl, Npad + 1,
                                  indices_are_sorted=True,
                                  sorted_pad_safe=True)[:Npad]
    from ..models.gn_block import _linear_split
    h_nf = _linear_split(params["nodefn"], nf.dtype,
                         [(agg, None), (nf, None), (gf, None)], rows=Npad)

    # -- global update: partial pools + psum, replicated compute --------
    e_pool = jnp.sum(jnp.where(em[:, None], h_ef, 0.0), axis=0)
    n_pool = jnp.sum(jnp.where(nm[:, None], h_nf, 0.0), axis=0)
    pools = jax.lax.psum(jnp.concatenate([e_pool, n_pool]), axis)
    h_gf = graphfn.apply(params["graphfn"],
                         jnp.concatenate([pools, gf[0]])[None, :])
    return h_ef, h_nf, h_gf


def gn_block_partitioned_overlap(block: GNBlock, params,
                                 pg: PartitionedGraph, plan: HaloPlan,
                                 mesh: Mesh, axis: str = "graph"
                                 ) -> PartitionedGraph:
    """Edge-partitioned GNBlock, v3: the edge update net is a single linear
    layer, so its sender term can be computed **before** the halo exchange —
    each shard transforms its own node block once (``nf @ W_src``,
    ``[Npad, DE']``) and the all-to-all moves *transformed* rows.

    Wins over v2 (``gn_block_partitioned_halo``):

    * comm volume scales with ``DE'`` instead of ``DN`` (a reduction whenever
      the block narrows features, e.g. decoder blocks);
    * the matmul against ``W_src`` runs at ``Npad`` rows instead of ``Epad``;
    * the all-to-all has no data dependency on the ``ef @ W_ef`` /
      ``(nf @ W_dst)[rl]`` / global terms, so XLA can overlap the collective
      with those local matmuls.

    Same semantics as v1/v2 (verified in tests); partial terms accumulate in
    f32 exactly like the single-device split path
    (``models.gn_block._linear_split``).  The per-shard body is
    :func:`block_local_v3` (shared with the partitioned stack/training path,
    ``edge_partition_stack.py``).
    """

    def local(params, send_idx, send_mask, sender_pos, rl, em, nm, nf, ef,
              gf):
        h_ef, h_nf, h_gf = block_local_v3(
            block, params, send_idx[0], sender_pos[0], rl[0], em[0], nm[0],
            nf[0], ef[0] if ef is not None else None, gf, axis)
        return h_ef[None], h_nf[None], h_gf

    shard = P(axis)
    repl = P()
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(repl, shard, shard, shard, shard, shard, shard, shard,
                  shard if pg.ef is not None else repl, repl),
        out_specs=(shard, shard, repl),
        check_vma=False,
    )
    h_ef, h_nf, h_gf = fn(params, plan.send_idx, plan.send_mask,
                          plan.sender_pos, pg.receivers_local, pg.edge_mask,
                          pg.node_mask, pg.nf, pg.ef, pg.gf)
    de_o_, dn_o, dg_o = block.out_dims
    return pg.replace(
        ef=h_ef if de_o_ > 0 else None,
        nf=h_nf,
        gf=h_gf if dg_o > 0 else None,
    )


# ---------------------------------------------------------------------------
# Locality-aware node ordering (halo minimization)
# ---------------------------------------------------------------------------


def bfs_node_order(senders: np.ndarray, receivers: np.ndarray,
                   num_nodes: int, start: int = 0) -> np.ndarray:
    """BFS (Cuthill-McKee-style) node ordering over the undirected skeleton.

    Contiguous-block partitioning of a BFS ordering keeps neighborhoods on
    the same shard, shrinking the boundary set the halo exchange must move
    (the graph analogue of sequence-parallel locality).  Returns ``order``
    with ``order[new_id] = old_id``.
    """
    from ..runtime import native
    und_s = np.concatenate([senders, receivers]).astype(np.int64)
    und_r = np.concatenate([receivers, senders]).astype(np.int64)
    indptr, adj = native.csc_from_coo(und_s, und_r, num_nodes)
    visited = np.zeros(num_nodes, bool)
    order = np.empty(num_nodes, np.int64)
    k = 0
    for seed in range(num_nodes):
        seed = (seed + start) % num_nodes
        if visited[seed]:
            continue
        queue = [seed]
        visited[seed] = True
        while queue:
            nxt = []
            for v in queue:
                order[k] = v
                k += 1
                nbrs = adj[indptr[v]: indptr[v + 1]]
                for u in np.unique(nbrs):
                    if not visited[u]:
                        visited[u] = True
                        nxt.append(int(u))
            queue = sorted(nxt)
    assert k == num_nodes
    return order


def partition_edges_assigned(senders: np.ndarray, receivers: np.ndarray,
                             nf: np.ndarray, assign: np.ndarray,
                             num_shards: int,
                             ef: Optional[np.ndarray] = None,
                             gf: Optional[np.ndarray] = None,
                             edge_pad_multiple: int = 128
                             ) -> Tuple[PartitionedGraph, np.ndarray]:
    """Partition with an explicit node->shard ``assign`` map.

    Nodes are relabeled so each shard's nodes are contiguous
    (``order[new_id] = old_id``; shard ``s`` owns new ids
    ``[s*npad, s*npad + k_s)``), which the contiguous-block
    :class:`PartitionedGraph` layout requires.  Returns ``(pg, order)``.
    """
    S = num_shards
    assign = np.asarray(assign, np.int64)
    counts = np.bincount(assign, minlength=S)
    npad = int(counts.max())
    order = np.argsort(assign, kind="stable")       # grouped by shard
    new_of_old = np.empty(len(assign), np.int64)
    pos = 0
    for s in range(S):
        k = int(counts[s])
        new_of_old[order[pos:pos + k]] = s * npad + np.arange(k)
        pos += k
    # Re-pack node features into the new id space (shard-padded blocks).
    nf_new = np.zeros((S * npad, nf.shape[1]), nf.dtype)
    nf_new[new_of_old] = nf
    pg = _partition_relabelled(new_of_old[senders], new_of_old[receivers],
                               nf_new, S, npad, ef=ef, gf=gf,
                               edge_pad_multiple=edge_pad_multiple,
                               real_counts=counts)
    return pg, order


def _partition_relabelled(senders, receivers, nf_padded, S, npad, ef, gf,
                          edge_pad_multiple, real_counts):
    """Build a PartitionedGraph from already shard-blocked node ids
    (shard ``s`` owns ids ``[s*npad, s*npad + real_counts[s])``).  Edges
    are sorted by local receiver and pads target segment ``npad``, like
    :func:`partition_edges`."""
    owner = receivers // npad
    counts = np.bincount(owner, minlength=S)
    epad = int(-(-max(int(counts.max()), 1) // edge_pad_multiple)
               * edge_pad_multiple)
    sg = np.zeros((S, epad), np.int32)
    rl = np.full((S, epad), npad, np.int32)
    em = np.zeros((S, epad), bool)
    eidx = np.full((S, epad), -1, np.int64)
    nm = np.zeros((S, npad), bool)
    nfp = np.zeros((S, npad, nf_padded.shape[1]), np.float32)
    efp = (np.zeros((S, epad, ef.shape[1]), np.float32)
           if ef is not None else None)
    for s in range(S):
        sel = np.where(owner == s)[0]
        rls = receivers[sel] - s * npad
        sel = sel[np.argsort(rls, kind="stable")]
        k = len(sel)
        sg[s, :k] = senders[sel]
        rl[s, :k] = receivers[sel] - s * npad
        em[s, :k] = True
        eidx[s, :k] = sel
        nm[s, : int(real_counts[s])] = True
        nfp[s] = nf_padded[s * npad:(s + 1) * npad]
        if ef is not None:
            efp[s, :k] = ef[sel]
    return PartitionedGraph(
        senders_global=jnp.asarray(sg), receivers_local=jnp.asarray(rl),
        edge_mask=jnp.asarray(em), node_mask=jnp.asarray(nm),
        nf=jnp.asarray(nfp),
        ef=jnp.asarray(efp) if efp is not None else None,
        gf=jnp.asarray(gf[None, :].astype(np.float32))
        if gf is not None else None,
        edge_index=eidx,
    )


def partition_edges_mincut(senders: np.ndarray, receivers: np.ndarray,
                           nf: np.ndarray, num_shards: int,
                           ef: Optional[np.ndarray] = None,
                           gf: Optional[np.ndarray] = None,
                           edge_pad_multiple: int = 128,
                           imbalance: float = 1.05,
                           passes: int = 8
                           ) -> Tuple[PartitionedGraph, np.ndarray]:
    """Min-edge-cut partition: BFS (locality) seed assignment + native
    greedy refinement (``runtime.native.refine_partition``) under a balance
    cap of ``imbalance * ceil(N/S)`` nodes per shard.  Returns
    ``(pg, order)`` like :func:`partition_edges_assigned`."""
    from ..runtime import native
    N = nf.shape[0]
    order = bfs_node_order(senders, receivers, N)
    inv = np.empty_like(order)
    inv[order] = np.arange(N)
    block = -(-N // num_shards)
    assign = np.minimum(inv // block, num_shards - 1)   # BFS-contiguous seed
    und_s = np.concatenate([senders, receivers]).astype(np.int64)
    und_r = np.concatenate([receivers, senders]).astype(np.int64)
    indptr, adj = native.csc_from_coo(und_s, und_r, N)
    cap = int(imbalance * block) + 1
    assign, _ = native.refine_partition(indptr, adj, assign, num_shards,
                                        cap=cap, passes=passes)
    return partition_edges_assigned(senders, receivers, nf, assign,
                                    num_shards, ef=ef, gf=gf,
                                    edge_pad_multiple=edge_pad_multiple)


def partition_edges_locality(senders: np.ndarray, receivers: np.ndarray,
                             nf: np.ndarray, num_shards: int,
                             ef: Optional[np.ndarray] = None,
                             gf: Optional[np.ndarray] = None,
                             edge_pad_multiple: int = 128
                             ) -> Tuple[PartitionedGraph, np.ndarray]:
    """BFS-reordered edge partition.  Returns ``(pg, order)`` where
    ``order[new_id] = old_id``; per-shard node block ``s`` holds old nodes
    ``order[s*npad : (s+1)*npad]``, so outputs map back via ``order``."""
    order = bfs_node_order(senders, receivers, nf.shape[0])
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    pg = partition_edges(inv[senders], inv[receivers], nf[order],
                         num_shards, ef=ef, gf=gf,
                         edge_pad_multiple=edge_pad_multiple)
    return pg, order
