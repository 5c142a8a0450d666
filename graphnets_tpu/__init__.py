"""graphnets_tpu — a TPU-native Graph Nets framework (JAX/XLA/Pallas/pjit).

A from-scratch framework with the capabilities of JuliaMLTools/GraphNets.jl
(reference at ``/root/reference``), redesigned TPU-first: sparse-COO batched
graphs with segment aggregation instead of dense PN^2 broadcaster matmuls,
static bucketed padding for XLA, Pallas kernels on the hot paths, and
mesh-sharded data/graph parallelism.

Public surface mirrors the reference's exports
(``/root/reference/src/GraphNets.jl:12-50``).
"""

from .graph import (
    GraphsTuple,
    PadSpec,
    batch,
    unbatch,
    efview,
    nfview,
    gfview,
    flat_unpadded_nf,
    flat_unpadded_ef,
    flatunpaddednf,
    flatunpaddedef,
    collapse_ef,
    collapse_ef_padded,
    collapsef,
    unpadded_collapsed_ef,
    flat_unpadded_collapsed_ef,
    GNGraphBatch,
    unpaddedcollapsedef,
    flatunpaddedcollapsedef,
    adjacency_matrices,
)
from .models.gn_block import (
    GNBlock,
    get_edge_fn_input,
    get_node_fn_input,
    get_graph_fn_input,
    getedgefninput,
    getnodefninput,
    getgraphfninput,
    zerodim2nothing,
)
from .models.gn_core import (
    GNCore,
    GNCoreList,
    GNFeedForward,
    GNGraphNorm,
    graphnet_add,
)
from .nn.core import Chain, Dropout, FeedForward, LayerNorm, Linear, relu

__version__ = "0.1.0"

__all__ = [
    "GraphsTuple", "PadSpec", "batch", "unbatch",
    "efview", "nfview", "gfview",
    "flat_unpadded_nf", "flat_unpadded_ef",
    "flatunpaddednf", "flatunpaddedef",
    "collapse_ef", "collapse_ef_padded", "collapsef", "unpadded_collapsed_ef",
    "flat_unpadded_collapsed_ef", "GNGraphBatch", "unpaddedcollapsedef",
    "flatunpaddedcollapsedef", "adjacency_matrices",
    "GNBlock", "get_edge_fn_input", "get_node_fn_input",
    "get_graph_fn_input", "getedgefninput", "getnodefninput",
    "getgraphfninput", "zerodim2nothing",
    "GNCore", "GNCoreList", "GNFeedForward", "GNGraphNorm", "graphnet_add",
    "Chain", "Dropout", "FeedForward", "LayerNorm", "Linear", "relu",
]
