"""Evaluation helpers for the sort task and node classification.

The reference only eyeballs results via SVG rendering
(``/root/reference/examples/sort/viz.jl``); here: quantitative slot- and
graph-level accuracies.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax

from ..data.sort_task import SortTaskConfig, get_batch, sort_pad_spec
from ..graph import GraphsTuple
from ..nn.core import Module


def sort_accuracy(model: Module, params, cfg: SortTaskConfig,
                  num_batches: int = 25, seed: int = 1234) -> Dict[str, float]:
    """Slot-level and whole-graph accuracy on fresh sort-task samples.

    ``graph_acc`` counts a graph correct only if every node AND every edge
    slot is predicted correctly — the strict task-solved metric.
    """
    rng = np.random.default_rng(seed)
    pad = sort_pad_spec(cfg)
    fwd = jax.jit(lambda p, g: model.apply(p, g))
    node_ok = node_tot = edge_ok = edge_tot = 0
    graph_ok = graph_tot = 0
    for _ in range(num_batches):
        x, y = get_batch(rng, cfg, pad)
        pred = fwd(params, x)
        pn = np.asarray(pred.nf).argmax(-1)
        pe = np.asarray(pred.ef).argmax(-1)
        tn = np.asarray(y.nf).argmax(-1)
        te = np.asarray(y.ef).argmax(-1)
        n_node = np.asarray(x.n_node)
        n_edge = np.asarray(x.n_edge)
        node_off = np.concatenate([[0], np.cumsum(n_node)])
        edge_off = np.concatenate([[0], np.cumsum(n_edge)])
        B = int(np.asarray(x.graph_mask).sum())
        for b in range(B):
            ns = slice(node_off[b], node_off[b + 1])
            es = slice(edge_off[b], edge_off[b + 1])
            nok = (pn[ns] == tn[ns]).sum()
            eok = (pe[es] == te[es]).sum()
            node_ok += nok
            node_tot += n_node[b]
            edge_ok += eok
            edge_tot += n_edge[b]
            graph_ok += int(nok == n_node[b] and eok == n_edge[b])
            graph_tot += 1
    return {
        "node_acc": node_ok / max(node_tot, 1),
        "edge_acc": edge_ok / max(edge_tot, 1),
        "graph_acc": graph_ok / max(graph_tot, 1),
    }
