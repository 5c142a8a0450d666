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

__all__ = ["SortTaskConfig", "gen_sample", "get_batch", "sort_pad_spec"]


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


def sort_pad_spec(cfg: SortTaskConfig) -> PadSpec:
    """Static pad sizes covering the worst case so jit compiles once."""
    max_n = cfg.batch_size * cfg.max_nodes
    max_e = cfg.batch_size * cfg.max_nodes ** 2
    return PadSpec(
        num_nodes=max_n + 1,
        num_edges=((max_e + 127) // 128) * 128,
        num_graphs=cfg.batch_size + 1,
    )


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
