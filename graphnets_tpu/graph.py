"""Batched-graph data structure for the TPU-native Graph Nets framework.

Design
------
The reference (GraphNets.jl) batches variable-structure graphs by padding every
graph to the max node count ``PN`` and materializing a dense ``PN**2`` edge-slot
space, with message passing expressed as batched dense matmuls against seven
precomputed 0/1 "broadcaster" matrices (``/root/reference/src/gngraphbatch.jl:1-54``).
That costs O(B * PN^4) broadcaster memory and is hostile to XLA (per-batch PN
means per-batch shapes).

This framework instead concatenates the batch into **one big sparse graph** in
COO form: ``senders[E]``, ``receivers[E]`` index a flat node array, and segment
id arrays map nodes/edges back to their graph. Gather = ``nf[senders]``,
scatter-aggregate = ``jax.ops.segment_sum``. Index memory is O(E); all shapes
are static (optionally bucket-padded for jit stability across batches).

Feature layout is **row-major feature-last**: ``ef: [E, DE]``, ``nf: [N, DN]``,
``gf: [B, DG]`` — idiomatic for XLA (the reference uses channel-first
``(D, T, B)``, ``/root/reference/src/batch.jl:48-50``).

Parity-critical conventions preserved from the reference:

* Adjacency entry ``(i, j) == 1`` is an edge with source = row ``i``,
  dest = column ``j`` (``/root/reference/src/gngraphbatch.jl:197-211``).
* Canonical edge order is the **column-major linear index of the adjacency**
  (``/root/reference/src/pad.jl:30``): edges sorted by (receiver, sender),
  receiver varying slowest. ``batch``/``unbatch``/views all follow this order.
* Node aggregation sums **incoming** edges per destination node
  (``/root/reference/src/gngraphbatch.jl:158-170``); graph aggregation sums
  over real nodes / real edges (``:136-156``).

Padding semantics: padded edge/node/graph slots never contaminate real slots —
aggregations mask padded contributions (the analogue of the reference's 0/1
broadcasters zeroing padded columns), and real edges by construction reference
only real nodes.  This preserves the reference's batch-invariance property
(``/root/reference/test/runtests.jl:62-116``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Any
ArrayLike = Any

__all__ = [
    "GraphsTuple",
    "PadSpec",
    "batch",
    "unbatch",
    "efview",
    "nfview",
    "gfview",
    "flat_unpadded_nf",
    "flat_unpadded_ef",
    "flatunpaddednf",
    "flatunpaddedef",
    "collapse_ef",
    "collapse_ef_padded",
    "collapsef",
    "unpadded_collapsed_ef",
    "flat_unpadded_collapsed_ef",
    "GNGraphBatch",
    "unpaddedcollapsedef",
    "flatunpaddedcollapsedef",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class PadSpec:
    """Static padding targets for jit-stable shapes.

    ``None`` fields mean "exact" (no padding on that axis).  For training loops
    over variable-structure batches, fix these (or use :meth:`bucketed`) so XLA
    compiles once.  Padding adds one virtual "padding graph" that owns all
    padding nodes and edges.

    ``per_slot=True`` (see :meth:`uniform`) switches to the UNIFORM slot
    layout: ``num_nodes``/``num_edges`` are then PER-GRAPH capacities — graph
    slot ``b`` owns node slots ``[b*num_nodes, (b+1)*num_nodes)`` and edge
    slots ``[b*num_edges, (b+1)*num_edges)``, padding slots interleaved per
    graph rather than appended at the end.  This sets
    ``GraphsTuple.slot_shape`` and unlocks the fused SDDMM edge-update
    kernel (``ops.pallas.edge_update``) on ``batch()``-produced data.
    Padded edges of slot ``b`` point at slot ``b``'s LAST node slot, so a
    graph with padded edges must have at least one padding node
    (``n_i < num_nodes`` whenever ``e_i < num_edges``) to preserve the
    pad-targets-pad aggregation invariant.
    """

    num_nodes: Optional[int] = None
    num_edges: Optional[int] = None
    num_graphs: Optional[int] = None
    per_slot: bool = False

    @staticmethod
    def bucketed(n_node: int, n_edge: int, n_graph: int,
                 node_multiple: int = 8, edge_multiple: int = 128) -> "PadSpec":
        """Round node/edge totals up to hardware-friendly multiples."""
        return PadSpec(
            num_nodes=_round_up(n_node + 1, node_multiple),
            num_edges=_round_up(n_edge, edge_multiple),
            num_graphs=n_graph + 1,
        )

    @staticmethod
    def uniform(n_slots: int, e_slots: int,
                num_graphs: Optional[int] = None,
                node_multiple: int = 8,
                edge_multiple: int = 128) -> "PadSpec":
        """Uniform slot layout: every graph slot owns ``n_slots`` node and
        ``e_slots`` edge slots (rounded up to hardware-friendly multiples —
        the fused edge-update kernel wants lane-aligned edge tiles).
        ``num_graphs`` > B appends fully-padded graph slots."""
        return PadSpec(
            num_nodes=_round_up(n_slots, node_multiple),
            num_edges=_round_up(e_slots, edge_multiple),
            num_graphs=num_graphs,
            per_slot=True,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GraphsTuple:
    """A batch of graphs as one big sparse graph (COO) — a JAX pytree.

    Structure arrays (all static-shaped, ``int32``/``bool``):

    * ``senders[E]`` / ``receivers[E]``: global node index of each edge's
      source / destination.  Padded edge slots point at a padding node (or are
      clipped in-range) and have ``edge_mask == False``.
    * ``node_graph[N]`` / ``edge_graph[E]``: graph id owning each node / edge.
    * ``n_node[G]`` / ``n_edge[G]``: real node / edge counts per graph slot.
    * ``node_mask[N]`` / ``edge_mask[E]`` / ``graph_mask[G]``: True for real
      slots.

    Features (``None`` when absent, mirroring the reference's ``nothing``
    dispatch, ``/root/reference/src/batch.jl:69-76``):

    * ``ef: [E, DE]``, ``nf: [N, DN]``, ``gf: [G, DG]``.

    ``homogeneous`` is static metadata: True when the batch was built from a
    single shared adjacency matrix (the reference's "same structure" mode,
    ``/root/reference/src/batch.jl:66``); it only affects ``unbatch`` output
    shape, never compiled computation (at most two compile variants).

    ``slot_shape`` is optional static metadata ``(n_slots, e_slots)``
    declaring a UNIFORM slot layout: graph slot ``b`` owns node slots
    ``[b*n_slots, (b+1)*n_slots)`` and edge slots ``[b*e_slots,
    (b+1)*e_slots)`` for EVERY graph slot.  ``batch()`` sets it for exact
    homogeneous batches and for ``PadSpec.uniform`` batches; it unlocks the
    fused SDDMM edge-update kernel (``ops.pallas.edge_update``).  ``None``
    = no uniformity claim.

    ``pad_aliases_real`` is static metadata set by the uniform layout when
    padding exists: padded node/edge slots share their graph's segment id
    (``node_graph``/``edge_graph`` equal the owning slot's graph, unlike the
    default layout where all padding belongs to a dedicated padding graph).
    Graph-level aggregations must then apply the node/edge masks — the
    aggregation helpers in ``ops.scatter`` take a ``mask_aliases_real``
    flag wired from here.  Edge->node aggregation stays mask-free: padded
    edges target their slot's last node slot, which is a padding node by
    the uniform-layout constraint.
    """

    senders: Array
    receivers: Array
    node_graph: Array
    edge_graph: Array
    n_node: Array
    n_edge: Array
    node_mask: Array
    edge_mask: Array
    graph_mask: Array
    ef: Optional[Array] = None
    nf: Optional[Array] = None
    gf: Optional[Array] = None
    homogeneous: bool = False
    slot_shape: Optional[Tuple[int, int]] = None
    pad_aliases_real: bool = False

    # -- pytree protocol ----------------------------------------------------
    _children = (
        "senders", "receivers", "node_graph", "edge_graph",
        "n_node", "n_edge", "node_mask", "edge_mask", "graph_mask",
        "ef", "nf", "gf",
    )

    def tree_flatten(self):
        return (tuple(getattr(self, k) for k in self._children),
                (self.homogeneous, self.slot_shape, self.pad_aliases_real))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, homogeneous=aux[0], slot_shape=aux[1],
                   pad_aliases_real=aux[2])

    # -- derived sizes ------------------------------------------------------
    @property
    def num_node_slots(self) -> int:
        return int(self.node_graph.shape[0])

    @property
    def num_edge_slots(self) -> int:
        return int(self.senders.shape[0])

    @property
    def num_graph_slots(self) -> int:
        return int(self.n_node.shape[0])

    def replace(self, **kw) -> "GraphsTuple":
        return dataclasses.replace(self, **kw)

    # Convenience: same structure, new features (the common forward-pass op).
    def with_features(self, ef=..., nf=..., gf=...) -> "GraphsTuple":
        kw = {}
        if ef is not ...:
            kw["ef"] = ef
        if nf is not ...:
            kw["nf"] = nf
        if gf is not ...:
            kw["gf"] = gf
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Host-side batching
# ---------------------------------------------------------------------------


def _adj_to_coo(adj: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Edges of one adjacency matrix in the reference's canonical order.

    Column-major enumeration (``/root/reference/src/pad.jl:30``): receiver
    (column) varies slowest, sender (row) fastest.  Entry counts as an edge iff
    it equals 1 (``/root/reference/src/checks.jl:43``).
    """
    adj = np.asarray(adj)
    rr, ss = np.nonzero((adj == 1).T)  # iterate columns (receivers) outer
    return ss.astype(np.int32), rr.astype(np.int32)


def _as_feature_list(x, B: int, what: str) -> Optional[List[np.ndarray]]:
    if x is None:
        return None
    if isinstance(x, (list, tuple)):
        # Heterogeneous mode: per-graph 2-D arrays
        # (/root/reference/src/checks.jl:92-129,136-160).
        if len(x) != B:
            raise ValueError(
                f"{what}: expected one feature array per graph "
                f"({B} graphs), got {len(x)}")
        out = [np.asarray(v) for v in x]
        for i, v in enumerate(out):
            if v.ndim != 2:
                raise ValueError(
                    f"{what}[{i}]: per-graph features must be 2-D "
                    f"[count, dim]; got shape {v.shape}")
        widths = {v.shape[1] for v in out}
        if len(widths) > 1:
            raise ValueError(
                f"{what}: inconsistent feature widths across graphs: "
                f"{sorted(widths)}")
        return out
    x = np.asarray(x)
    # Homogeneous mode: [B, T, D] stacked features
    # (/root/reference/src/checks.jl:62-85, feature-last layout).
    if x.ndim != 3 or x.shape[0] != B:
        raise ValueError(
            f"{what}: homogeneous features must be [B, T, D] with "
            f"B={B}; got shape {x.shape}")
    return [x[i] for i in range(B)]


def batch(
    data: dict,
    pad: Optional[PadSpec] = None,
) -> GraphsTuple:
    """Build a :class:`GraphsTuple` from adjacency matrices + features.

    Mirrors the reference's public ``batch`` entry
    (``/root/reference/src/batch.jl:53-64``) with a feature-last layout:

    * ``data["graphs"]``: one adjacency matrix (homogeneous batch — every
      graph shares the structure) or a list of per-graph matrices.
    * ``data["ef"]``: edge features — homogeneous: ``[B, E, DE]``;
      heterogeneous: list of ``[E_i, DE]``; or ``None``.
    * ``data["nf"]``: node features — ``[B, N, DN]`` / list of ``[N_i, DN]`` /
      ``None``.
    * ``data["gf"]``: graph features — ``[B, DG]`` / list of ``[DG]`` / ``None``.

    Edge features must be listed in the canonical (column-major adjacency)
    edge order, exactly as the reference requires.
    """
    if set(data.keys()) != {"graphs", "ef", "nf", "gf"}:
        raise ValueError(
            "batch input must be a dict with exactly the keys "
            "{'graphs', 'ef', 'nf', 'gf'} (absent feature sets are None; "
            f"/root/reference/src/batch.jl:54); got {sorted(data.keys())}")
    graphs, ef, nf, gf = data["graphs"], data["ef"], data["nf"], data["gf"]
    if ef is None and nf is None and gf is None:
        raise ValueError(
            "at least one of ef/nf/gf must be present "
            "(/root/reference/src/checks.jl)")

    homogeneous = not isinstance(graphs, (list, tuple))
    if homogeneous:
        if gf is not None:
            gf = np.asarray(gf)
            B = gf.shape[0]
        elif nf is not None:
            nf = np.asarray(nf)
            B = nf.shape[0]
        else:
            ef = np.asarray(ef)
            B = ef.shape[0]
        adj_mats = [np.asarray(graphs)] * B
    else:
        adj_mats = [np.asarray(a) for a in graphs]
        B = len(adj_mats)

    ef_list = _as_feature_list(ef, B, "ef")
    nf_list = _as_feature_list(nf, B, "nf")
    gf_arr = None
    if gf is not None:
        gf_arr = (np.stack([np.asarray(v) for v in gf])
                  if isinstance(gf, (list, tuple)) else np.asarray(gf))
        if gf_arr.ndim != 2 or gf_arr.shape[0] != B:
            raise ValueError(
                f"gf: graph features must be [B, DG] with B={B} (or a "
                f"list of B 1-D arrays); got shape {gf_arr.shape}")

    # --- validation (the reference's checks.jl:23-55 count checks) ---------
    for i, a in enumerate(adj_mats):
        if a.ndim != 2 or a.shape[0] != a.shape[1]:
            raise ValueError(
                f"graphs[{i}]: adjacency matrix must be square 2-D; got "
                f"shape {a.shape}")
        n, e = a.shape[0], int((a == 1).sum())
        if nf_list is not None and nf_list[i].shape[0] != n:
            raise ValueError(
                f"graph {i}: nf has {nf_list[i].shape[0]} rows but the "
                f"adjacency has {n} nodes "
                "(/root/reference/src/checks.jl:23-55)")
        if ef_list is not None and ef_list[i].shape[0] != e:
            raise ValueError(
                f"graph {i}: ef has {ef_list[i].shape[0]} rows but the "
                f"adjacency has {e} edges (entries == 1; "
                "/root/reference/src/checks.jl:43)")

    # --- concatenate into one big graph (native C++ fast path) -------------
    from .runtime import native
    n_node = np.array([a.shape[0] for a in adj_mats], dtype=np.int32)
    senders, receivers, n_edge = native.batch_coo(adj_mats)

    N, E, G = int(n_node.sum()), int(n_edge.sum()), B

    # --- padding to static bucket sizes ------------------------------------
    if pad is None:
        pad = PadSpec()
    if pad.per_slot:
        return _batch_uniform(adj_mats, n_node, n_edge, senders, receivers,
                              ef_list, nf_list, gf_arr, pad, homogeneous)
    NP = pad.num_nodes if pad.num_nodes is not None else N
    EP = pad.num_edges if pad.num_edges is not None else E
    GP = pad.num_graphs if pad.num_graphs is not None else G
    assert NP >= N and EP >= E and GP >= G, (
        f"pad spec ({NP},{EP},{GP}) smaller than batch ({N},{E},{G})")
    if (NP > N or EP > E) and GP == G:
        raise ValueError(
            "padding nodes/edges requires at least one padding graph slot "
            "(num_graphs >= B + 1) to own them")
    if EP > E and NP == N:
        raise ValueError(
            "padding edges requires at least one padding node "
            "(num_nodes >= N + 1) for them to target: padded edges "
            "pointing at a real node would break the sorted/pad-targets-pad "
            "invariant the aggregation kernels rely on "
            "(use PadSpec.bucketed, which reserves one)")

    node_graph = np.repeat(np.arange(B, dtype=np.int32), n_node)
    edge_graph = np.repeat(np.arange(B, dtype=np.int32), n_edge)
    # Padding nodes/edges belong to the first padding graph; padded edges
    # point at the first padding node (enforced to exist above whenever
    # there are padded edges) so they never alias a real segment.
    pad_node_id = N if NP > N else 0
    node_graph = np.concatenate(
        [node_graph, np.full(NP - N, B, np.int32)])
    edge_graph = np.concatenate(
        [edge_graph, np.full(EP - E, B, np.int32)])
    senders = np.concatenate(
        [senders, np.full(EP - E, pad_node_id, np.int32)])
    receivers = np.concatenate(
        [receivers, np.full(EP - E, pad_node_id, np.int32)])
    n_node_p = np.concatenate([n_node, np.zeros(GP - G, np.int32)])
    n_edge_p = np.concatenate([n_edge, np.zeros(GP - G, np.int32)])
    node_mask = np.arange(NP) < N
    edge_mask = np.arange(EP) < E
    graph_mask = np.arange(GP) < G

    def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
        if x.shape[0] == rows:
            return x
        out = np.zeros((rows,) + x.shape[1:], x.dtype)
        out[: x.shape[0]] = x
        return out

    def _cat_feats(lst: Optional[List[np.ndarray]], rows: int):
        if lst is None:
            return None
        flat = np.concatenate([np.asarray(v, np.float32) for v in lst], axis=0)
        return jnp.asarray(_pad_rows(flat.astype(np.float32), rows))

    out = GraphsTuple(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        node_graph=jnp.asarray(node_graph),
        edge_graph=jnp.asarray(edge_graph),
        n_node=jnp.asarray(n_node_p),
        n_edge=jnp.asarray(n_edge_p),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        ef=_cat_feats(ef_list, EP),
        nf=_cat_feats(nf_list, NP),
        gf=(jnp.asarray(_pad_rows(np.asarray(gf_arr, np.float32), GP))
            if gf_arr is not None else None),
        homogeneous=homogeneous,
        # Exact homogeneous batches (no padding slots) have a uniform slot
        # layout: every graph owns the same number of node/edge slots.
        slot_shape=((int(n_node[0]), int(n_edge[0]))
                    if (homogeneous and GP == B and NP == N and EP == E
                        and B > 0) else None),
    )
    from .utils.config import debug_checks
    if debug_checks():
        from .utils.debug import validate_graph
        validate_graph(out)
    return out


def _batch_uniform(adj_mats, n_node, n_edge, senders, receivers,
                   ef_list, nf_list, gf_arr, pad: PadSpec,
                   homogeneous: bool) -> GraphsTuple:
    """Uniform slot layout (``PadSpec.uniform``): every graph slot owns
    ``ns`` node slots and ``es`` edge slots, padding interleaved per slot.

    Layout invariants (consumed by the fused SDDMM kernel,
    ``ops.pallas.edge_update``, and by the sorted-segment-sum kernels):

    * graph slot ``b`` owns nodes ``[b*ns, (b+1)*ns)`` and edges
      ``[b*es, (b+1)*es)``; real slots are a prefix of each range;
    * padded edges of slot ``b`` point (sender AND receiver) at slot ``b``'s
      last node slot — a padding node (enforced: ``n_i < ns`` whenever
      ``e_i < es``) — keeping ``receivers`` globally ascending and padded
      aggregation targets disjoint from real ones;
    * ``node_graph``/``edge_graph`` equal the owning slot for PADDING slots
      too, so graph-level aggregations need the masks
      (``pad_aliases_real=True``).
    """
    B = len(adj_mats)
    ns, es = pad.num_nodes, pad.num_edges
    GP = pad.num_graphs if pad.num_graphs is not None else B
    if GP < B:
        raise ValueError(f"PadSpec.uniform num_graphs={GP} < batch size {B}")
    for i in range(B):
        n_i, e_i = int(n_node[i]), int(n_edge[i])
        if n_i > ns or e_i > es:
            raise ValueError(
                f"graph {i} ({n_i} nodes / {e_i} edges) exceeds the uniform "
                f"slot capacity (n_slots={ns}, e_slots={es})")
        if e_i < es and n_i >= ns:
            raise ValueError(
                f"graph {i} has padded edge slots ({e_i} < {es}) but no "
                f"padding node ({n_i} == n_slots={ns}); padded edges must "
                "target a padding node — raise n_slots by one")
    if GP > B and ns < 1:
        raise ValueError("padding graph slots require n_slots >= 1")

    node_cum = np.concatenate([[0], np.cumsum(n_node)]).astype(np.int64)
    slot_node_base = np.arange(B, dtype=np.int64) * ns
    slot_edge_base = np.arange(B, dtype=np.int64) * es

    # Real edge endpoints, re-based from the packed layout to slot offsets.
    shift = (slot_node_base - node_cum[:-1]).astype(np.int64)
    e_shift = np.repeat(shift, n_edge)
    s_u = senders.astype(np.int64) + e_shift
    r_u = receivers.astype(np.int64) + e_shift

    # Every slot's padded endpoints start at the slot's last node slot.
    last_node = (np.arange(GP, dtype=np.int64) * ns + ns - 1)
    senders_u = np.repeat(last_node, es)
    receivers_u = senders_u.copy()
    epos = (np.repeat(slot_edge_base, n_edge)
            + _ranges(n_edge)).astype(np.int64)
    senders_u[epos] = s_u
    receivers_u[epos] = r_u

    node_graph = np.repeat(np.arange(GP, dtype=np.int32), ns)
    edge_graph = np.repeat(np.arange(GP, dtype=np.int32), es)
    loc_n = np.tile(np.arange(ns, dtype=np.int64), GP)
    loc_e = np.tile(np.arange(es, dtype=np.int64), GP)
    n_node_p = np.concatenate([n_node, np.zeros(GP - B, np.int32)])
    n_edge_p = np.concatenate([n_edge, np.zeros(GP - B, np.int32)])
    node_mask = loc_n < np.repeat(n_node_p.astype(np.int64), ns)
    edge_mask = loc_e < np.repeat(n_edge_p.astype(np.int64), es)

    def _place(lst: Optional[List[np.ndarray]], rows: int, base, counts):
        if lst is None:
            return None
        flat = np.concatenate([np.asarray(v, np.float32) for v in lst],
                              axis=0)
        out = np.zeros((rows,) + flat.shape[1:], np.float32)
        pos = (np.repeat(base, counts) + _ranges(counts)).astype(np.int64)
        out[pos] = flat
        return jnp.asarray(out)

    gf = None
    if gf_arr is not None:
        gf_p = np.zeros((GP, gf_arr.shape[1]), np.float32)
        gf_p[:B] = np.asarray(gf_arr, np.float32)
        gf = jnp.asarray(gf_p)

    padded = bool(GP > B or (~node_mask).any() or (~edge_mask).any())
    out = GraphsTuple(
        senders=jnp.asarray(senders_u.astype(np.int32)),
        receivers=jnp.asarray(receivers_u.astype(np.int32)),
        node_graph=jnp.asarray(node_graph),
        edge_graph=jnp.asarray(edge_graph),
        n_node=jnp.asarray(n_node_p),
        n_edge=jnp.asarray(n_edge_p),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(np.arange(GP) < B),
        ef=_place(ef_list, GP * es, slot_edge_base, n_edge),
        nf=_place(nf_list, GP * ns, slot_node_base, n_node),
        gf=gf,
        homogeneous=homogeneous,
        slot_shape=(ns, es),
        pad_aliases_real=padded,
    )
    from .utils.config import debug_checks
    if debug_checks():
        from .utils.debug import validate_graph
        validate_graph(out)
    return out


def _ranges(counts) -> np.ndarray:
    """``concat([arange(c) for c in counts])`` without a Python loop."""
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts,
                                                        counts)


# ---------------------------------------------------------------------------
# Host-side unbatching & views
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def _host_meta(g: GraphsTuple):
    """Per-graph (count, slot-offset) metadata.  ``node_off[i]`` is where
    graph ``i``'s real nodes START; its real nodes span
    ``[node_off[i], node_off[i] + n_node[i])`` (NOT ``node_off[i+1]``,
    which may include interleaved padding in the uniform slot layout)."""
    n_node = _np(g.n_node)
    n_edge = _np(g.n_edge)
    gm = _np(g.graph_mask)
    B = int(gm.sum())
    if g.slot_shape is not None:
        ns, es = g.slot_shape
        node_off = (np.arange(len(n_node) + 1, dtype=np.int64) * ns)
        edge_off = (np.arange(len(n_edge) + 1, dtype=np.int64) * es)
    else:
        node_off = np.concatenate([[0], np.cumsum(n_node)]).astype(np.int64)
        edge_off = np.concatenate([[0], np.cumsum(n_edge)]).astype(np.int64)
    return B, n_node, n_edge, node_off, edge_off


def adjacency_matrices(g: GraphsTuple) -> List[np.ndarray]:
    """Reconstruct per-graph adjacency matrices (host-side)."""
    B, n_node, n_edge, node_off, edge_off = _host_meta(g)
    s, r = _np(g.senders), _np(g.receivers)
    mats = []
    for i in range(B):
        n = int(n_node[i])
        a = np.zeros((n, n), dtype=np.int64)
        es, ee = edge_off[i], edge_off[i] + int(n_edge[i])
        a[s[es:ee] - node_off[i], r[es:ee] - node_off[i]] = 1
        mats.append(a)
    return mats


def unbatch(g: GraphsTuple) -> dict:
    """Inverse of :func:`batch` (``/root/reference/src/unbatch.jl:6-39``).

    Homogeneous batches return stacked arrays ``ef: [B, E, DE]`` etc.;
    heterogeneous batches return per-graph lists.  Host-side op.
    """
    assert g.ef is not None or g.nf is not None or g.gf is not None
    B, n_node, n_edge, node_off, edge_off = _host_meta(g)
    mats = adjacency_matrices(g)
    ef = _np(g.ef) if g.ef is not None else None
    nf = _np(g.nf) if g.nf is not None else None
    gf = _np(g.gf) if g.gf is not None else None

    ef_l = (None if ef is None else
            [ef[edge_off[i]:edge_off[i] + int(n_edge[i])]
             for i in range(B)])
    nf_l = (None if nf is None else
            [nf[node_off[i]:node_off[i] + int(n_node[i])]
             for i in range(B)])
    gf_l = None if gf is None else [gf[i] for i in range(B)]

    if g.homogeneous:
        return {
            "graphs": mats[0],
            "ef": None if ef_l is None else np.stack(ef_l),
            "nf": None if nf_l is None else np.stack(nf_l),
            "gf": None if gf_l is None else np.stack(gf_l),
        }
    return {"graphs": mats, "ef": ef_l, "nf": nf_l, "gf": gf_l}


def efview(g: GraphsTuple, d1, d2, d3):
    """Edge-feature view: feature-sel, edge index (canonical order, within
    graph ``d3``), graph index (``/root/reference/src/views.jl:6-31``,
    transposed to feature-last: here ``[edge, feature]`` semantics)."""
    assert g.ef is not None
    _, _, _, _, edge_off = _host_meta(g)
    ef = _np(g.ef)
    return ef[edge_off[d3]:edge_off[d3 + 1]][d2, d1]


def nfview(g: GraphsTuple, d1, d2, d3):
    """Node-feature view (``/root/reference/src/views.jl:33-61``)."""
    assert g.nf is not None
    _, _, _, node_off, _ = _host_meta(g)
    nf = _np(g.nf)
    return nf[node_off[d3]:node_off[d3 + 1]][d2, d1]


def gfview(g: GraphsTuple, d1, d2):
    """Graph-feature view (``/root/reference/src/views.jl:63-78``)."""
    assert g.gf is not None
    return _np(g.gf)[d2, d1]


def _real_count(mask, what: str) -> int:
    if isinstance(mask, jax.core.Tracer):
        raise TypeError(
            f"flat_unpadded_{what} slices to the REAL slot count, which is "
            "data-dependent — it cannot run under jit (the reference's "
            "equivalent, /root/reference/src/views.jl:80-98, is its loss "
            "path, but a jit-compatible loss should use the masked losses "
            "in graphnets_tpu.training.losses instead; call this on "
            "concrete arrays outside jit).")
    return int(_np(mask).sum())


def flat_unpadded_nf(g: GraphsTuple) -> Array:
    """All real node features as ``[sum_i N_i, DN]`` — the loss path
    (``/root/reference/src/views.jl:80-88``).

    In the big-graph layout real nodes are already contiguous, so this is a
    static slice — differentiable, but host-side (NOT jit-traceable: the
    output length is data-dependent; inside jit use the masked losses in
    ``graphnets_tpu.training.losses``).
    """
    assert g.nf is not None
    if g.pad_aliases_real:
        # Uniform layout: padding interleaves per slot — select by mask
        # (still differentiable: a take by precomputed host indices).
        idx = np.nonzero(_np(g.node_mask))[0]
        return jnp.take(g.nf, jnp.asarray(idx), axis=0)
    return g.nf[:_real_count(g.node_mask, "nf")]


def flat_unpadded_ef(g: GraphsTuple) -> Array:
    """All real edge features as ``[sum_i E_i, DE]``
    (``/root/reference/src/views.jl:90-98``).  Host-side; see
    :func:`flat_unpadded_nf` for the jit caveat."""
    assert g.ef is not None
    if g.pad_aliases_real:
        idx = np.nonzero(_np(g.edge_mask))[0]
        return jnp.take(g.ef, jnp.asarray(idx), axis=0)
    return g.ef[:_real_count(g.edge_mask, "ef")]


# Reference-spelled aliases.
flatunpaddednf = flat_unpadded_nf
flatunpaddedef = flat_unpadded_ef


# ---------------------------------------------------------------------------
# Edge collapsing (directed -> undirected features)
# ---------------------------------------------------------------------------


def _collapse_indices(g: GraphsTuple):
    """Per-graph (fwd_idx, rev_idx, self_loop) for present lower-tri edges.

    Reference semantics (``/root/reference/src/gngraphbatch.jl:56-111``): for
    each lower-triangular coordinate (i >= j, column-major order) where
    ``adj[i, j] == 1``, output the mean of edge slots (i, j) and (j, i); a
    self-loop (i == j) maps to itself.  When the reverse edge (j, i) is absent
    the reference averages with an uninitialized padded slot; we define the
    missing direction as 0 instead (only observable on asymmetric graphs).
    """
    B, n_node, n_edge, node_off, edge_off = _host_meta(g)
    s, r = _np(g.senders), _np(g.receivers)
    out = []
    for b in range(B):
        n = int(n_node[b])
        es, ee = edge_off[b], edge_off[b] + int(n_edge[b])
        # Map (local i, j) -> edge index within this graph.
        pos = {(int(si - node_off[b]), int(ri - node_off[b])): int(k)
               for k, (si, ri) in enumerate(zip(s[es:ee], r[es:ee]))}
        fwd, rev, selfloop = [], [], []
        for j in range(n):           # column-major lower triangle
            for i in range(j, n):
                if (i, j) in pos:
                    fwd.append(pos[(i, j)])
                    rev.append(pos.get((j, i), -1))
                    selfloop.append(i == j)
        out.append((np.array(fwd, np.int64), np.array(rev, np.int64),
                    np.array(selfloop, bool)))
    return out, edge_off


def collapse_ef(g: GraphsTuple) -> List[np.ndarray]:
    """Symmetrized (undirected) edge features per graph, present lower-tri
    edges only — the reference's ``unpaddedcollapsedef``
    (``/root/reference/src/gngraphbatch.jl:87-107``). Host-side."""
    assert g.ef is not None
    info, edge_off = _collapse_indices(g)
    ef = _np(g.ef)
    outs = []
    for b, (fwd, rev, selfloop) in enumerate(info):
        base = ef[edge_off[b]:]  # fwd/rev index the real-edge prefix
        f = base[fwd] if len(fwd) else np.zeros((0, ef.shape[1]), ef.dtype)
        rv = np.where((rev >= 0)[:, None], base[np.maximum(rev, 0)], 0.0) \
            if len(fwd) else f
        out = np.where(selfloop[:, None], f, (f + rv) / 2.0)
        outs.append(out.astype(ef.dtype))
    return outs


def collapse_ef_padded(g: GraphsTuple) -> np.ndarray:
    """The reference's padded ``collapsef`` variant
    (``/root/reference/src/gngraphbatch.jl:83-85``): the FULL lower-
    triangular slot space, padded coordinates included.

    Returns ``[B, PN*(PN+1)/2, DE]`` (feature-last transpose of the
    reference's ``(DE, PN(PN+1)/2, B)``), where ``PN`` is the max node
    count in the batch.  Slot for lower-tri coordinate ``(i, j)`` (column-
    major enumeration, ``getlowertriangularcoords``) holds
    ``(ef[(i,j)] + ef[(j,i)]) / 2`` with absent directions contributing 0
    (the reference scatters into a zeros buffer) and self-loops mapping to
    themselves (the collapser adds slot ``(i,i)`` twice, cancelling the
    ``/2``).  Host-side.
    """
    assert g.ef is not None
    B, n_node, n_edge, node_off, edge_off = _host_meta(g)
    s, r = _np(g.senders), _np(g.receivers)
    ef = _np(g.ef)
    DE = ef.shape[1]
    PN = int(n_node.max()) if B else 0
    dense = np.zeros((B, PN, PN, DE), ef.dtype)
    for b in range(B):
        es, ee = edge_off[b], edge_off[b] + int(n_edge[b])
        dense[b, s[es:ee] - node_off[b], r[es:ee] - node_off[b]] = ef[es:ee]
    sym = (dense + np.swapaxes(dense, 1, 2)) / 2.0
    # Self-loop diagonal: collapser column (i,i) has weight 2 -> value = ef.
    ii = np.arange(PN)
    sym[:, ii, ii] = dense[:, ii, ii]
    # Column-major lower triangle: j outer, i in [j, PN).
    cols = [sym[:, i, j] for j in range(PN) for i in range(j, PN)]
    return (np.stack(cols, axis=1) if cols
            else np.zeros((B, 0, DE), ef.dtype))


def unpadded_collapsed_ef(g: GraphsTuple) -> List[np.ndarray]:
    return collapse_ef(g)


def flat_unpadded_collapsed_ef(g: GraphsTuple) -> np.ndarray:
    """Concatenation over the batch
    (``/root/reference/src/gngraphbatch.jl:109-111``)."""
    outs = collapse_ef(g)
    return np.concatenate(outs, axis=0)


collapsef = collapse_ef

# Reference-spelled aliases (export surface of
# /root/reference/src/GraphNets.jl:12-50).
GNGraphBatch = GraphsTuple
unpaddedcollapsedef = unpadded_collapsed_ef
flatunpaddedcollapsedef = flat_unpadded_collapsed_ef
