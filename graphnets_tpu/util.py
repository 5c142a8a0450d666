"""Per-graph feature extraction helpers — the working parts of the
reference's ``src/util.jl`` surface (``getedgefeatures/getnodefeatures/
getgraphfeatures``, ``/root/reference/src/util.jl:31-59``; its ``padcat`` is
dead code with a bug and is intentionally not reproduced)."""

from __future__ import annotations

from typing import List

import numpy as np

from .graph import GraphsTuple, _host_meta, _np

__all__ = ["get_edge_features", "get_node_features", "get_graph_features"]


def get_edge_features(g: GraphsTuple, graph_idx: int) -> np.ndarray:
    """Copy of graph ``graph_idx``'s edge features ``[E_i, DE]``."""
    assert g.ef is not None
    _, _, _, _, edge_off = _host_meta(g)
    return np.array(_np(g.ef)[edge_off[graph_idx]:edge_off[graph_idx + 1]])


def get_node_features(g: GraphsTuple, graph_idx: int) -> np.ndarray:
    """Copy of graph ``graph_idx``'s node features ``[N_i, DN]``."""
    assert g.nf is not None
    _, _, _, node_off, _ = _host_meta(g)
    return np.array(_np(g.nf)[node_off[graph_idx]:node_off[graph_idx + 1]])


def get_graph_features(g: GraphsTuple, graph_idx: int) -> np.ndarray:
    """Copy of graph ``graph_idx``'s global features ``[DG]``."""
    assert g.gf is not None
    return np.array(_np(g.gf)[graph_idx])
