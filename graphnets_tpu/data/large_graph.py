"""Large-graph storage + neighbor-sampling loader (SURVEY.md §2.3: absent in
the reference — graphs there are <= ~10 nodes; required for the OGB
arxiv/products-scale configs in BASELINE.json).

``LargeGraph`` holds a big directed graph in CSC-by-destination form (edges
grouped by receiver — the aggregation direction).  ``NeighborSampler`` draws
GraphSAGE-style fixed-fanout incoming neighborhoods around seed nodes and
emits **static-shaped** :class:`GraphsTuple` mini-batches (mask-padded), so
the training step compiles once.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..graph import GraphsTuple

__all__ = ["LargeGraph", "NeighborSampler", "SampledBatch",
           "device_feature_table"]


@dataclasses.dataclass
class LargeGraph:
    """Host-side big graph: CSC by destination + node features/labels."""

    indptr: np.ndarray     # [N+1] edge range per destination node
    src: np.ndarray        # [E] source node per edge (grouped by dest)
    node_feat: np.ndarray  # [N, D]
    labels: Optional[np.ndarray] = None  # [N] int labels

    @staticmethod
    def from_coo(senders: np.ndarray, receivers: np.ndarray,
                 node_feat: np.ndarray,
                 labels: Optional[np.ndarray] = None) -> "LargeGraph":
        from ..runtime import native
        n = node_feat.shape[0]
        indptr, src = native.csc_from_coo(senders, receivers, n)
        return LargeGraph(indptr=indptr, src=src, node_feat=node_feat,
                          labels=labels)

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return len(self.src)

    def in_degree(self, nodes: np.ndarray) -> np.ndarray:
        return self.indptr[nodes + 1] - self.indptr[nodes]


@dataclasses.dataclass
class SampledBatch:
    graph: GraphsTuple
    seed_local_idx: jnp.ndarray   # positions of the seed nodes in graph.nf
    labels: Optional[jnp.ndarray]  # [num_seeds] labels of seeds
    label_mask: jnp.ndarray       # [num_seeds] False for padded seeds
    # emit_node_ids mode: global node id per subgraph node slot (pad slots
    # -> num_nodes, the zero row of a device-resident feature table built
    # by :func:`device_feature_table`); ``graph.nf`` is None and the
    # training step gathers features ON DEVICE — the batch ships ~KBs of
    # indices instead of ~MBs of gathered features (the round-3 sampler
    # bottleneck was exactly this host->device feature traffic).
    node_ids: Optional[np.ndarray] = None


def device_feature_table(g: "LargeGraph", dtype=None):
    """Device-resident ``[N + 1, D]`` feature table (last row = zeros, the
    pad row ``node_ids`` point at).  Build once; reuse across batches."""
    feat = np.concatenate(
        [g.node_feat, np.zeros((1, g.node_feat.shape[1]), np.float32)])
    arr = jnp.asarray(feat)
    return arr.astype(dtype) if dtype is not None else arr


class NeighborSampler:
    """Fixed-fanout incoming-neighborhood sampler with static output shapes.

    Layout of the sampled subgraph's node array: seeds first (positions
    ``0..B-1``), then sampled frontier nodes layer by layer.  Edges point
    from sampled neighbors to the node they were sampled for (the
    aggregation direction), so an L-layer GN stack over the subgraph gives
    every seed an L-hop receptive field — the standard GraphSAGE contract.
    """

    def __init__(self, g: LargeGraph, fanouts: Sequence[int],
                 batch_size: int, seed: int = 0,
                 emit_node_ids: bool = False):
        self.g = g
        self.fanouts = tuple(fanouts)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        # emit_node_ids: batches carry global node INDICES instead of
        # host-gathered features (graph.nf = None); pair with
        # :func:`device_feature_table` and an in-step device gather.
        self.emit_node_ids = emit_node_ids
        # Static capacities.
        caps_nodes = [batch_size]
        caps_edges = []
        cur = batch_size
        for f in self.fanouts:
            caps_edges.append(cur * f)
            cur = cur * f
            caps_nodes.append(cur)
        self.max_nodes = int(sum(caps_nodes)) + 1     # +1 pad node
        # Round BOTH capacities to multiples of 128: the Pallas kernel
        # gates (fused G=1 edge update, sorted segment sum) require
        # 32/128-aligned row counts — an unaligned node capacity (e.g.
        # 56,833 for batch 512 x fanouts (10, 10)) silently dropped the
        # whole subgraph step to the unfused path (round-5 OGB roofline).
        self.max_nodes = ((self.max_nodes + 127) // 128) * 128
        self.max_edges = int(sum(caps_edges))
        self.max_edges = ((self.max_edges + 127) // 128) * 128

    def sample(self, seeds: np.ndarray) -> SampledBatch:
        g = self.g
        B = self.batch_size
        assert len(seeds) <= B
        n_seeds = len(seeds)

        nodes: List[np.ndarray] = [np.asarray(seeds, np.int64)]
        senders_l: List[np.ndarray] = []
        receivers_l: List[np.ndarray] = []
        offset = 0
        frontier = nodes[0]
        frontier_pos = np.arange(n_seeds)
        next_pos_start = n_seeds
        from ..runtime import native
        for f in self.fanouts:
            # sample up to f incoming edges per frontier node
            if native.available() and len(frontier):
                srcs, recv = native.sample_layer(
                    g.indptr, g.src, np.asarray(frontier, np.int64),
                    np.asarray(frontier_pos, np.int64), f,
                    int(self.rng.integers(1, 2 ** 62)))
            else:
                deg = g.in_degree(np.asarray(frontier, np.int64)) \
                    if len(frontier) else np.zeros(0, np.int64)
                new_src, e_r = [], []
                for i, v in enumerate(frontier):
                    d = deg[i]
                    if d == 0:
                        continue
                    k = min(f, int(d))
                    sel = self.rng.choice(int(d), size=k, replace=False)
                    s_ = g.src[g.indptr[v]: g.indptr[v + 1]][sel]
                    new_src.append(s_)
                    e_r.append(np.full(len(s_), frontier_pos[i]))
                if new_src:
                    srcs = np.concatenate(new_src)
                    recv = np.concatenate(e_r)
                else:
                    srcs = np.zeros((0,), np.int64)
                    recv = np.zeros((0,), np.int64)
            pos = next_pos_start + np.arange(len(srcs))
            senders_l.append(pos)
            receivers_l.append(recv)
            nodes.append(srcs)
            frontier = srcs
            frontier_pos = pos
            next_pos_start = next_pos_start + len(srcs)

        all_nodes = np.concatenate(nodes)
        N = len(all_nodes)
        E = sum(len(s) for s in senders_l)
        NP, EP = self.max_nodes, self.max_edges
        assert N <= NP and E <= EP, (N, NP, E, EP)

        senders = np.zeros(EP, np.int32)
        receivers = np.zeros(EP, np.int32)
        if E:
            senders[:E] = np.concatenate(senders_l)
            receivers[:E] = np.concatenate(receivers_l)
        # padded slots point at the pad node
        senders[E:] = N
        receivers[E:] = N

        node_ids = None
        if self.emit_node_ids:
            nf_arr = None
            node_ids = np.full(NP, g.num_nodes, np.int32)  # pad row
            node_ids[:N] = all_nodes
            node_ids = jnp.asarray(node_ids)
        else:
            from ..runtime import native
            nf = np.zeros((NP, g.node_feat.shape[1]), np.float32)
            native.gather_rows(g.node_feat, all_nodes, out=nf[:N])
            nf_arr = jnp.asarray(nf)

        graph = GraphsTuple(
            senders=jnp.asarray(senders),
            receivers=jnp.asarray(receivers),
            node_graph=jnp.zeros((NP,), jnp.int32),
            edge_graph=jnp.zeros((EP,), jnp.int32),
            n_node=jnp.asarray([N], jnp.int32),
            n_edge=jnp.asarray([E], jnp.int32),
            node_mask=jnp.asarray(np.arange(NP) < N),
            edge_mask=jnp.asarray(np.arange(EP) < E),
            graph_mask=jnp.ones((1,), bool),
            ef=None, nf=nf_arr, gf=None,
        )
        labels = None
        if g.labels is not None:
            lab = np.zeros(B, np.int64)
            lab[:n_seeds] = g.labels[seeds]
            labels = jnp.asarray(lab)
        return SampledBatch(
            graph=graph,
            seed_local_idx=jnp.asarray(np.arange(B, dtype=np.int32)),
            labels=labels,
            label_mask=jnp.asarray(np.arange(B) < n_seeds),
            node_ids=node_ids,
        )

    def epoch(self, train_nodes: np.ndarray, shuffle: bool = True):
        """Iterate mini-batches of seeds over an epoch."""
        idx = np.array(train_nodes)
        if shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            yield self.sample(idx[i: i + self.batch_size])
