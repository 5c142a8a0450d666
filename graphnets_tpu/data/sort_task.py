"""The list-sorting graph task — the reference's north-star example.

Data generation mirrors ``/root/reference/examples/sort/sort.jl:12-24`` and
``helper.jl:1-12``: graphs of ``n in [min_nodes, max_nodes]`` nodes, fully
connected (including self-loops), input node features = one-hot of an integer
in ``1..vocab_size``; node targets = one-hot of "is the minimum"; edge targets
= one-hot of "dest follows src in sorted order" (stable sort by value, ties
broken by original position).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..graph import GraphsTuple, PadSpec, batch

__all__ = ["SortTaskConfig", "gen_sample", "get_batch", "sort_pad_spec",
           "device_batch"]


@dataclasses.dataclass(frozen=True)
class SortTaskConfig:
    vocab_size: int = 100
    min_nodes: int = 2
    max_nodes: int = 10
    batch_size: int = 4


def _edge_targets(values: np.ndarray) -> np.ndarray:
    """Consecutive-in-sorted-order edge labels, canonical (column-major)
    edge order on the fully-connected graph
    (``/root/reference/examples/sort/helper.jl:1-12``)."""
    n = len(values)
    order = np.argsort(values, kind="stable")  # ties -> original position
    mat = np.zeros((n, n), dtype=np.int64)
    for a, b in zip(order[:-1], order[1:]):
        mat[a, b] = 1
    # Column-major flatten = canonical edge order for the full graph.
    return mat.flatten(order="F")


def gen_sample(rng: np.random.Generator, cfg: SortTaskConfig):
    n = int(rng.integers(cfg.min_nodes, cfg.max_nodes + 1))
    adj = np.ones((n, n), dtype=np.int64)
    values = rng.integers(1, cfg.vocab_size + 1, size=n)
    x_nf = np.eye(cfg.vocab_size, dtype=np.float32)[values - 1]  # [n, V]
    is_min = (values == values.min()).astype(np.int64)
    y_nf = np.eye(2, dtype=np.float32)[is_min]                   # [n, 2]
    y_ef = np.eye(2, dtype=np.float32)[_edge_targets(values)]    # [n*n, 2]
    return adj, x_nf, y_nf, y_ef, values


def sort_pad_spec(cfg: SortTaskConfig, uniform: bool = False) -> PadSpec:
    """Static pad sizes covering the worst case so jit compiles once.

    ``uniform=True``: the uniform slot layout (``PadSpec.uniform``) — every
    graph slot owns ``max_nodes + 1`` node slots (one reserved padding
    node, rounded up) and ``max_nodes**2`` edge slots (rounded up to a
    lane multiple).  This sets ``slot_shape`` and makes the bf16 flagship's
    core blocks eligible for the fused SDDMM edge-update kernel."""
    if uniform:
        return PadSpec.uniform(cfg.max_nodes + 1, cfg.max_nodes ** 2)
    max_n = cfg.batch_size * cfg.max_nodes
    max_e = cfg.batch_size * cfg.max_nodes ** 2
    return PadSpec(
        num_nodes=max_n + 1,
        num_edges=((max_e + 127) // 128) * 128,
        num_graphs=cfg.batch_size + 1,
    )


def device_batch(key, cfg: SortTaskConfig,
                 pad: Optional[PadSpec] = None,
                 dtype=None) -> Tuple[GraphsTuple, GraphsTuple]:
    """One (input, target) batch generated ON DEVICE — jit/scan-compatible.

    Semantically identical to :func:`get_batch` (same distribution, same
    canonical edge order, same targets as
    ``/root/reference/examples/sort/sort.jl:12-24`` + ``helper.jl:1-12``)
    but built entirely from ``jax.random`` + vectorized index math, so a
    training loop can ``lax.scan`` over steps with zero host round-trips —
    the host-side ``batch()`` path costs a dispatch per step through the
    TPU tunnel, which dominates at this task's tiny sizes.
    """
    import jax
    import jax.numpy as jnp

    pad = pad or sort_pad_spec(cfg)
    if pad.per_slot:
        return _device_batch_uniform(key, cfg, pad, dtype)
    B = cfg.batch_size
    NP, EP, GP = pad.num_nodes, pad.num_edges, pad.num_graphs
    assert GP >= B + 1 and NP >= B * cfg.max_nodes + 1
    V, MN = cfg.vocab_size, cfg.max_nodes
    dtype = dtype or jnp.float32

    kn, kv = jax.random.split(key)
    n = jax.random.randint(kn, (B,), cfg.min_nodes, cfg.max_nodes + 1,
                           dtype=jnp.int32)
    values = jax.random.randint(kv, (B, MN), 1, V + 1, dtype=jnp.int32)

    node_end = jnp.cumsum(n)                        # [B]
    node_off = jnp.concatenate([jnp.zeros((1,), jnp.int32), node_end])
    N = node_end[-1]

    t = jnp.arange(NP, dtype=jnp.int32)
    node_graph = jnp.searchsorted(node_end, t, side="right").astype(jnp.int32)
    node_mask = t < N
    ng_c = jnp.minimum(node_graph, B - 1)
    li = t - node_off[ng_c]                         # local node index
    val_node = values[ng_c, jnp.minimum(li, MN - 1)]

    x_nf = jax.nn.one_hot(val_node - 1, V, dtype=dtype)
    x_nf = jnp.where(node_mask[:, None], x_nf, 0)

    # "is minimum" node targets (ties all count, like the reference).
    big = V + 2
    masked_val = jnp.where(node_mask, val_node, big)
    graph_min = jax.ops.segment_min(masked_val, node_graph,
                                    num_segments=GP,
                                    indices_are_sorted=True)
    is_min = (val_node == graph_min[node_graph]) & node_mask
    y_nf = jax.nn.one_hot(is_min.astype(jnp.int32), 2, dtype=dtype)

    # Stable sort rank within each graph: key = (graph, value, position);
    # position breaks ties exactly like the reference's stable sort.
    stride = (V + 2) * (MN + 1)
    sort_key = (node_graph * stride + masked_val * (MN + 1)
                + jnp.minimum(li, MN))
    order = jnp.argsort(sort_key)
    rank = jnp.argsort(order).astype(jnp.int32)     # inverse permutation
    rank_w = rank - node_off[ng_c]                  # rank within graph

    # Edges: full n_b x n_b adjacency per graph, canonical column-major
    # order (receiver varies slowest).
    e_end = jnp.cumsum(n * n)
    e_off = jnp.concatenate([jnp.zeros((1,), jnp.int32), e_end])
    E = e_end[-1]
    e = jnp.arange(EP, dtype=jnp.int32)
    edge_mask = e < E
    edge_graph = jnp.searchsorted(e_end, e, side="right").astype(jnp.int32)
    eg_c = jnp.minimum(edge_graph, B - 1)
    ke = e - e_off[eg_c]
    nb = jnp.maximum(n[eg_c], 1)
    recv_l = ke // nb
    send_l = ke % nb
    senders = jnp.where(edge_mask, node_off[eg_c] + send_l, N)
    receivers = jnp.where(edge_mask, node_off[eg_c] + recv_l, N)

    # Edge target: receiver directly follows sender in sorted order.
    consecutive = (rank_w[senders] + 1 == rank_w[receivers]) & edge_mask
    y_ef = jax.nn.one_hot(consecutive.astype(jnp.int32), 2, dtype=dtype)

    gslot = jnp.arange(GP, dtype=jnp.int32)
    n_node = jnp.where(gslot < B, n[jnp.minimum(gslot, B - 1)], 0)
    n_edge = jnp.where(gslot < B, (n * n)[jnp.minimum(gslot, B - 1)], 0)
    graph_mask = gslot < B

    common = dict(
        senders=senders, receivers=receivers,
        node_graph=node_graph, edge_graph=edge_graph,
        n_node=n_node, n_edge=n_edge,
        node_mask=node_mask, edge_mask=edge_mask, graph_mask=graph_mask,
        gf=None, homogeneous=False,
    )
    x = GraphsTuple(ef=None, nf=x_nf, **common)
    y = GraphsTuple(ef=y_ef, nf=y_nf, **common)
    return x, y


def _device_batch_uniform(key, cfg: SortTaskConfig, pad: PadSpec,
                          dtype=None) -> Tuple[GraphsTuple, GraphsTuple]:
    """Uniform-slot-layout variant of :func:`device_batch` — same sample
    distribution and targets, laid out so graph slot ``b`` owns node slots
    ``[b*ns, (b+1)*ns)`` and edge slots ``[b*es, (b+1)*es)`` (see
    ``graph._batch_uniform``).  In bf16 this layout routes the core
    blocks through the fused SDDMM edge-update kernel."""
    import jax
    import jax.numpy as jnp

    B = cfg.batch_size
    ns, es = pad.num_nodes, pad.num_edges
    GP = pad.num_graphs if pad.num_graphs is not None else B
    assert GP >= B and ns > cfg.max_nodes and es >= cfg.max_nodes ** 2, (
        "uniform sort layout needs one padding node per slot "
        "(n_slots > max_nodes) and e_slots >= max_nodes^2")
    V, MN = cfg.vocab_size, cfg.max_nodes
    dtype = dtype or jnp.float32

    kn, kv = jax.random.split(key)
    n = jax.random.randint(kn, (B,), cfg.min_nodes, cfg.max_nodes + 1,
                           dtype=jnp.int32)
    n = jnp.concatenate([n, jnp.zeros((GP - B,), jnp.int32)])
    values = jax.random.randint(kv, (B, MN), 1, V + 1, dtype=jnp.int32)
    values = jnp.concatenate(
        [values, jnp.ones((GP - B, MN), jnp.int32)], axis=0)

    t = jnp.arange(GP * ns, dtype=jnp.int32)
    slot = t // ns
    li = t % ns
    node_graph = slot
    node_mask = li < n[slot]
    val_node = values[slot, jnp.minimum(li, MN - 1)]

    x_nf = jax.nn.one_hot(val_node - 1, V, dtype=dtype)
    x_nf = jnp.where(node_mask[:, None], x_nf, 0)

    big = V + 2
    masked_val = jnp.where(node_mask, val_node, big)
    graph_min = jax.ops.segment_min(masked_val, node_graph,
                                    num_segments=GP,
                                    indices_are_sorted=True)
    is_min = (val_node == graph_min[node_graph]) & node_mask
    y_nf = jax.nn.one_hot(is_min.astype(jnp.int32), 2, dtype=dtype)

    # Stable sort rank within each slot: every slot holds exactly ns keyed
    # entries (padding sorts after real via masked_val=big), so the first
    # entry of slot b lands at global rank b*ns.
    stride = (V + 3) * (ns + 1)
    sort_key = node_graph * stride + masked_val * (ns + 1) + li
    order = jnp.argsort(sort_key)
    rank = jnp.argsort(order).astype(jnp.int32)
    rank_w = rank - node_graph * ns

    e = jnp.arange(GP * es, dtype=jnp.int32)
    eslot = e // es
    ke = e % es
    nb = jnp.maximum(n[eslot], 1)
    edge_mask = ke < n[eslot] * n[eslot]
    recv_l = ke // nb
    send_l = ke % nb
    last = (eslot + 1) * ns - 1      # the slot's padding node
    senders = jnp.where(edge_mask, eslot * ns + send_l, last)
    receivers = jnp.where(edge_mask, eslot * ns + recv_l, last)

    consecutive = (rank_w[senders] + 1 == rank_w[receivers]) & edge_mask
    y_ef = jax.nn.one_hot(consecutive.astype(jnp.int32), 2, dtype=dtype)

    common = dict(
        senders=senders, receivers=receivers,
        node_graph=node_graph, edge_graph=eslot,
        n_node=n, n_edge=n * n,
        node_mask=node_mask, edge_mask=edge_mask,
        graph_mask=jnp.arange(GP, dtype=jnp.int32) < B,
        gf=None, homogeneous=False,
        slot_shape=(ns, es), pad_aliases_real=True,
    )
    x = GraphsTuple(ef=None, nf=x_nf, **common)
    y = GraphsTuple(ef=y_ef, nf=y_nf, **common)
    return x, y


def get_batch(rng: np.random.Generator, cfg: SortTaskConfig,
              pad: Optional[PadSpec] = None
              ) -> Tuple[GraphsTuple, GraphsTuple]:
    """One (input, target) batched pair with jit-stable shapes
    (``/root/reference/examples/sort/sort.jl:31-46``)."""
    pad = pad or sort_pad_spec(cfg)
    samples = [gen_sample(rng, cfg) for _ in range(cfg.batch_size)]
    adjs = [s[0] for s in samples]
    x = batch({"graphs": adjs, "ef": None,
               "nf": [s[1] for s in samples], "gf": None}, pad=pad)
    y = batch({"graphs": adjs, "ef": [s[3] for s in samples],
               "nf": [s[2] for s in samples], "gf": None}, pad=pad)
    return x, y
