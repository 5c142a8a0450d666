"""GNBlock — the full Graph Network block (Battaglia et al. 2018), TPU-native.

Reference: ``/root/reference/src/gnblock.jl`` plus the input-assembly files
``edgefninput.jl`` / ``nodefninput.jl`` / ``graphfninput.jl``.  Semantics kept
exactly (these define parity):

* update order **edge -> node -> graph**, each consuming updated upstream
  features (``/root/reference/src/gnblock.jl:63-69``);
* edge update input = ``[ef, nf[senders], nf[receivers], gf_broadcast]``
  (``/root/reference/src/edgefninput.jl:1-8``, concat order preserved);
* node update input = ``[sum_incoming(h_ef), nf, gf_broadcast]``
  (``/root/reference/src/nodefninput.jl:1-7``);
* graph update input = ``[sum_edges(h_ef), sum_nodes(h_nf), gf]``
  (``/root/reference/src/graphfninput.jl:1-7``);
* update networks are single linear layers with input dims
  ``edge: DE + 2 DN + DG``, ``node: DN + DE' + DG``, ``graph: DN' + DE' + DG``
  (``/root/reference/src/gnblock.jl:50-54``);
* zero feature dims are legal; zero-dim outputs become ``None``
  (``zerodim2nothing``, ``/root/reference/src/gnblock.jl:71-78``);
* the constructor accepts ``dropout`` but the block itself never applies it —
  the reference constructs a Dropout field and leaves it unused
  (``/root/reference/src/gnblock.jl:59`` vs ``:63-69``); we replicate the
  behavior, not the intent.

Implementation is sparse-COO: gathers/segment-sums instead of the reference's
dense-broadcaster batched matmuls — O(E) instead of O(PN^2 B) work.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph import GraphsTuple
from ..nn.core import Linear, Module
from ..ops import scatter

Array = jax.Array

__all__ = [
    "GNBlock",
    "get_edge_fn_input",
    "get_node_fn_input",
    "get_graph_fn_input",
    "getedgefninput",
    "getnodefninput",
    "getgraphfninput",
    "zerodim2nothing",
]


def _concat(parts) -> Array:
    parts = [p for p in parts if p is not None]
    assert parts, "at least one of ef/nf/gf must be present"
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=-1)


def get_edge_fn_input(g: GraphsTuple, ef=..., nf=..., gf=...) -> Array:
    """Assemble per-edge update input ``[E, DE + 2 DN + DG]``
    (``/root/reference/src/edgefninput.jl``; absent features contribute no
    columns, matching the ``Nothing``-dispatch variants)."""
    ef = g.ef if ef is ... else ef
    nf = g.nf if nf is ... else nf
    gf = g.gf if gf is ... else gf
    parts = [ef]
    if nf is not None:
        parts.append(scatter.gather_nodes(nf, g.senders))
        parts.append(scatter.gather_nodes(nf, g.receivers, idx_sorted=True))
    if gf is not None:
        parts.append(scatter.broadcast_globals_to_edges(gf, g.edge_graph))
    return _concat(parts)


def get_node_fn_input(g: GraphsTuple, ef=..., nf=..., gf=...) -> Array:
    """Assemble per-node update input ``[N, DE' + DN + DG]``.  Edge features
    are always required (the edge update runs first;
    ``/root/reference/src/nodefninput.jl`` has no ``ef::Nothing`` methods)."""
    ef = g.ef if ef is ... else ef
    nf = g.nf if nf is ... else nf
    gf = g.gf if gf is ... else gf
    assert ef is not None
    parts = [scatter.aggregate_edges_for_nodes(
        ef, g.receivers, g.num_node_slots, g.edge_mask)]
    if nf is not None:
        parts.append(nf)
    if gf is not None:
        parts.append(scatter.broadcast_globals_to_nodes(gf, g.node_graph))
    return _concat(parts)


def get_graph_fn_input(g: GraphsTuple, ef=..., nf=..., gf=...) -> Array:
    """Assemble per-graph update input ``[G, DE' + DN' + DG]``; edge and node
    features always required (``/root/reference/src/graphfninput.jl``)."""
    ef = g.ef if ef is ... else ef
    nf = g.nf if nf is ... else nf
    gf = g.gf if gf is ... else gf
    assert ef is not None and nf is not None
    parts = [
        scatter.aggregate_edges_for_globals(
            ef, g.edge_graph, g.num_graph_slots, g.edge_mask,
            mask_aliases_real=g.pad_aliases_real),
        scatter.aggregate_nodes_for_globals(
            nf, g.node_graph, g.num_graph_slots, g.node_mask,
            mask_aliases_real=g.pad_aliases_real),
    ]
    if gf is not None:
        parts.append(gf)
    return _concat(parts)


# Reference-spelled aliases (``/root/reference/src/GraphNets.jl:26-32``
# exports getedgefninput / getnodefninput / getgraphfninput).
getedgefninput = get_edge_fn_input
getnodefninput = get_node_fn_input
getgraphfninput = get_graph_fn_input


def _linear_split(params, out_dtype, terms, rows):
    """``concat(xs, -1) @ W + b`` computed as a sum of per-segment matmuls.

    ``terms`` is a sequence of ``(x, idx)`` or ``(x, idx, ln_params)``: each
    ``x`` consumes the next ``x.shape[-1]`` rows of ``W``; when ``idx`` is
    not None the partial product's rows are gathered by ``idx`` after the
    matmul (gather-after-transform).  When ``ln_params`` is present the term
    is ``LayerNorm(x) @ W_slice`` computed by the fused Pallas ``ln_matmul``
    kernel (the GNCore's pre-block edge LN fused into the edge update —
    saves a full ``[E, D]`` HBM round trip).  Each per-row dot product is
    identical to the fused concat formulation; partial terms accumulate in
    f32, so this is at least as accurate.  Replaces the reference's
    input-assembly + Dense pair (``/root/reference/src/edgefninput.jl`` +
    ``src/gnblock.jl:56``) without ever materializing the
    ``[E, DE + 2 DN + DG]`` concat.
    """
    from ..utils.config import use_pallas
    w, b = params["w"], params.get("b")
    acc = None
    off = 0
    ln_term = None  # (x, ln_params, w_slice) — completed last, fused
    fused_gather = None  # (partial_table, idx) — completed last-but-one
    for term in terms:
        x, idx = term[0], term[1]
        ln_params = term[2] if len(term) > 2 else None
        idx_sorted = term[3] if len(term) > 3 else False
        windows = term[4] if len(term) > 4 else None
        d = x.shape[-1]
        if d == 0:
            continue
        ws = jax.lax.slice_in_dim(w, off, off + d, axis=0)
        off += d
        if ln_params is not None:
            assert idx is None and ln_term is None
            ln_term = (x, ln_params, ws)
            continue
        y = jax.lax.dot_general(
            x, ws.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if (idx is not None and idx_sorted and fused_gather is None
                and use_pallas()):
            # Defer the first sorted gathered term: completed below by the
            # fused gather+addend kernel (one pass, no separate add
            # stream).  The f32 accumulator keeps the sum exact before a
            # single rounding, so this never costs accuracy.
            from ..ops.pallas.gather import supports_sorted_gather
            if supports_sorted_gather(idx.shape[0], y.shape[0],
                                      y.shape[1]):
                from ..utils.config import bf16_gather_partials
                if (x.dtype == jnp.bfloat16
                        and bf16_gather_partials(idx.shape[0])):
                    y = y.astype(jnp.bfloat16)
                fused_gather = (y, idx)
                continue
        if idx is not None:
            # Partials gather in f32 by default (rounding them to bf16
            # would make the split path slightly less accurate than the
            # fused concat formulation, which keeps every per-row dot in
            # f32 end to end) — EXCEPT for large bandwidth-bound gathers,
            # where bf16 partials halve the dominant HBM streams
            # (config.bf16_gather_partials; <=3 extra bf16 roundings per
            # element).  The gather's backward scatter-add runs sorted
            # (Pallas kernel) instead of as an XLA serial scatter; for
            # canonically sorted index arrays (receivers / edge_graph /
            # node_graph) the per-step argsort is skipped too, and the
            # forward gather itself runs as the Pallas windowed one-hot
            # kernel (ops/pallas/gather.py).
            from ..utils.config import bf16_gather_partials
            if (x.dtype == jnp.bfloat16
                    and bf16_gather_partials(idx.shape[0])):
                y = y.astype(jnp.bfloat16)
            y = scatter.take_rows_sorted_grad(y, idx, idx_sorted, windows)
        acc = y.astype(jnp.float32) if acc is None \
            else acc + y.astype(jnp.float32)
    if acc is None and ln_term is None and fused_gather is None:
        # All-zero-width input: Linear(0, dout) is a bias broadcast.  (With
        # a deferred fused_gather term, acc stays None so the gather takes
        # the cheaper no-addend path instead of streaming zeros.)
        acc = jnp.zeros((rows, w.shape[1]), jnp.float32)
    if b is not None:
        bf = b.astype(jnp.float32)
        acc = bf if acc is None else acc + bf
    if fused_gather is not None:
        from ..ops.pallas.gather import sorted_gather_add
        yt, gidx = fused_gather
        if acc is None:
            acc = scatter.take_rows_sorted_grad(yt, gidx, True) \
                .astype(jnp.float32)
        else:
            if acc.ndim == 1:
                acc = jnp.broadcast_to(acc, (rows, w.shape[1]))
            acc = sorted_gather_add(yt, gidx, acc)
    if ln_term is not None:
        # Complete the row inside the LN->matmul kernel: the f32 sum of the
        # other partials (+ bias) enters as the kernel's addend, so the only
        # rounding is the single final one — exactly the concat
        # formulation's accuracy — and the f32 partial never hits HBM.
        from ..ops.pallas.ln_linear import ln_matmul
        x, ln_params, ws = ln_term
        if acc is not None and acc.ndim == 1:
            acc = jnp.broadcast_to(acc, (rows, w.shape[1]))
        if acc is None:
            acc = jnp.zeros((rows, w.shape[1]), jnp.float32)
        return ln_matmul(x, ln_params["scale"], ln_params["bias"], ws,
                         addend=acc).astype(out_dtype)
    return acc.astype(out_dtype)


def zerodim2nothing(g: GraphsTuple) -> GraphsTuple:
    """Zero-width feature arrays become ``None``
    (``/root/reference/src/gnblock.jl:71-78``)."""
    def fix(x):
        return None if (x is not None and x.shape[-1] == 0) else x
    return g.with_features(ef=fix(g.ef), nf=fix(g.nf), gf=fix(g.gf))


@dataclasses.dataclass(frozen=True)
class GNBlock(Module):
    """``GNBlock(in_dims, out_dims)`` with ``dims = (DE, DN, DG)``.

    ``init(key) -> params``; ``apply(params, g) -> GraphsTuple`` with updated
    ``ef/nf/gf`` (zero-dim outputs mapped to ``None``).
    """

    in_dims: Tuple[int, int, int]
    out_dims: Tuple[int, int, int]
    dropout: float = 0.0  # constructed-but-unused, like the reference

    def __post_init__(self):
        assert any(d > 0 for d in self.in_dims), "need one input feature set"
        assert any(d > 0 for d in self.out_dims), "need one output feature set"

    def _nets(self):
        de, dn, dg = self.in_dims
        de_o, dn_o, dg_o = self.out_dims
        edge_in = de + 2 * dn + dg
        node_in = dn + de_o + dg
        graph_in = dn_o + de_o + dg
        return (Linear(edge_in, de_o), Linear(node_in, dn_o),
                Linear(graph_in, dg_o))

    def init(self, key: jax.Array):
        ek, nk, gk = jax.random.split(key, 3)
        edgefn, nodefn, graphfn = self._nets()
        return {"edgefn": edgefn.init(ek), "nodefn": nodefn.init(nk),
                "graphfn": graphfn.init(gk)}

    def apply(self, params, g: GraphsTuple, *, training: bool = False,
              rng=None, ef_ln=None) -> GraphsTuple:
        """``ef_ln``: optional LayerNorm params ``{"scale", "bias"}`` to
        apply to ``ef`` before the edge update — lets the GNCore fuse its
        pre-block edge GraphNorm into the edge-update matmul (Pallas
        ``ln_matmul``) instead of materializing the normalized ``[E, D]``
        array.  Semantics == ``LayerNorm(ef)`` then the normal block."""
        edgefn, nodefn, graphfn = self._nets()
        de, dn, dg = self.in_dims
        # Normalize absent inputs to zero-width arrays so declared dims and
        # runtime widths agree (the reference instead dispatches on Nothing).
        E, N, G = g.num_edge_slots, g.num_node_slots, g.num_graph_slots
        dtype = next(a.dtype for a in (g.ef, g.nf, g.gf) if a is not None)
        ef = g.ef if g.ef is not None else jnp.zeros((E, 0), dtype)
        nf = g.nf if g.nf is not None else jnp.zeros((N, 0), dtype)
        gf = g.gf if g.gf is not None else jnp.zeros((G, 0), dtype)
        assert ef.shape[-1] == de and nf.shape[-1] == dn and \
            gf.shape[-1] == dg, (
                f"feature dims {(ef.shape[-1], nf.shape[-1], gf.shape[-1])} "
                f"!= declared in_dims {self.in_dims}")

        from ..utils.config import use_split_linear
        if ef_ln is not None and not (use_split_linear() and de > 0):
            # Fallback: materialize the LN (pure path keeps oracle numerics).
            from ..nn.core import LayerNorm
            ef = LayerNorm(de).apply(ef_ln, ef)
            ef_ln = None
        if use_split_linear():
            # Gather-after-transform: node/global features are transformed
            # once at N/G rows, the results gathered to E edge slots — the
            # same per-row dots as the concat formulation (see
            # ``_linear_split``), at ~1/(1 + 2N/E) of the edge-update FLOPs.
            h_ef, agg = self._edge_update_split(params, g, ef, nf, gf,
                                                ef_ln, dtype,
                                                training=training)
            if agg is None:
                agg = scatter.aggregate_edges_for_nodes(
                    h_ef, g.receivers, N, g.edge_mask)
            else:
                # The G=1 kernel emits the f32 segment sum in the same
                # pass; cast at segment_sum's rounding point.
                agg = agg.astype(dtype)
            h_nf = _linear_split(
                params["nodefn"], dtype,
                [(agg, None), (nf, None),
                 (gf, g.node_graph, None, True)], rows=N)
            h_gf = graphfn.apply(params["graphfn"],
                                 get_graph_fn_input(g, ef=h_ef, nf=h_nf,
                                                    gf=gf))
        else:
            h_ef = edgefn.apply(params["edgefn"],
                                get_edge_fn_input(g, ef=ef, nf=nf, gf=gf))
            h_nf = nodefn.apply(params["nodefn"],
                                get_node_fn_input(g, ef=h_ef, nf=nf, gf=gf))
            h_gf = graphfn.apply(params["graphfn"],
                                 get_graph_fn_input(g, ef=h_ef, nf=h_nf,
                                                    gf=gf))
        return zerodim2nothing(g.with_features(ef=h_ef, nf=h_nf, gf=h_gf))

    def _edge_update_split(self, params, g: GraphsTuple, ef, nf, gf,
                           ef_ln, dtype, training: bool = False):
        """Split-linear edge update; routes to the fused SDDMM kernel for
        uniform slot layouts (``ops.pallas.edge_update``), else to
        gather-after-transform partial sums."""
        from ..utils.config import use_pallas
        de, dn, dg = self.in_dims
        de_o = self.out_dims[0]
        E, N, G = g.num_edge_slots, g.num_node_slots, g.num_graph_slots
        if (use_pallas() and g.slot_shape is not None
                and de > 0 and dn > 0 and dg > 0):
            from ..ops.pallas.edge_update import (fused_edge_update,
                                                  supports_fused_edge_update)
            n_slots, e_slots = g.slot_shape
            if supports_fused_edge_update(E, N, G, de, de_o, n_slots,
                                          e_slots, ef.dtype):
                w, b = params["edgefn"]["w"], params["edgefn"].get("b")
                mm = lambda x, ws: jax.lax.dot_general(
                    x, ws.astype(x.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ts = mm(nf, jax.lax.slice_in_dim(w, de, de + dn, axis=0))
                tr = mm(nf, jax.lax.slice_in_dim(w, de + dn, de + 2 * dn,
                                                 axis=0))
                tg = mm(gf, jax.lax.slice_in_dim(w, de + 2 * dn,
                                                 de + 2 * dn + dg, axis=0))
                w0 = jax.lax.slice_in_dim(w, 0, de, axis=0)
                # Agg fusion is a forward-path win at these sizes; under
                # training its backward adds an f32 gather + add that
                # outweighs the saved re-read (measured 3.93 -> 4.05 ms),
                # so the training graph keeps the separate aggregation.
                if (not training
                        and supports_fused_edge_update(
                            E, N, G, de, de_o, n_slots, e_slots, ef.dtype,
                            with_agg=True)):
                    # Same kernel pass also writes each tile's (complete,
                    # disjoint) edge->node segment-sum block — the
                    # separate [E, dout] re-read disappears.
                    from ..ops.pallas.edge_update import \
                        fused_edge_update_agg
                    h, agg = fused_edge_update_agg(
                        ef, ef_ln, w0, ts, tr, tg, b, g.senders,
                        g.receivers, n_slots, e_slots)
                    return h.astype(dtype), agg
                return fused_edge_update(
                    ef, ef_ln, w0, ts, tr, tg, b, g.senders, g.receivers,
                    n_slots, e_slots).astype(dtype), None
        if use_pallas() and G == 1 and de > 0 and dn > 0:
            # Single-graph (large-graph) fused path: receivers are
            # globally ascending in canonical order, so the receiver
            # gather + LN(ef) @ W + sender/graph/bias addends fuse into
            # ONE kernel pass (ops/pallas/edge_update_g1.py).  The sender
            # gather (random access) stays an XLA stream feeding the
            # kernel's addend input.
            from ..ops.pallas.edge_update_g1 import (
                fused_g1_edge_update, supports_g1_edge_update)
            from ..utils.config import bf16_gather_partials
            bf16_parts = (ef.dtype == jnp.bfloat16
                          and bf16_gather_partials(E))
            part_itemsize = 2 if bf16_parts else 4
            itemsize = ef.dtype.itemsize
            if supports_g1_edge_update(E, N, de, de_o, itemsize,
                                       part_itemsize=part_itemsize):
                w, b = params["edgefn"]["w"], params["edgefn"].get("b")
                mm = lambda x, ws: jax.lax.dot_general(
                    x, ws.astype(x.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pdt = ef.dtype if bf16_parts else jnp.float32
                ts = mm(nf, jax.lax.slice_in_dim(w, de, de + dn,
                                                 axis=0)).astype(pdt)
                tr = mm(nf, jax.lax.slice_in_dim(w, de + dn, de + 2 * dn,
                                                 axis=0)).astype(pdt)
                src = scatter.take_rows_sorted_grad(ts, g.senders)
                gb = jnp.zeros((de_o,), jnp.float32)
                if dg > 0:
                    gb = gb + mm(gf, jax.lax.slice_in_dim(
                        w, de + 2 * dn, de + 2 * dn + dg, axis=0))[0]
                if b is not None:
                    gb = gb + b.astype(jnp.float32)
                w0 = jax.lax.slice_in_dim(w, 0, de, axis=0)
                # Agg fusion under training: decided from measurement like
                # the G>=2 gate above and re-validated r5b after the
                # backward-permute optimization (bench_large_train_r5b.txt
                # at N=65k/E=1M/D=256 bf16): fused still wins (171.86 vs
                # 177.97 ms), so the gate defaults ON
                # (config.g1_agg_fusion_training).
                from ..utils.config import g1_agg_fusion_training
                if ((not training or g1_agg_fusion_training())
                        and supports_g1_edge_update(
                            E, N, de, de_o, itemsize, with_agg=True,
                            part_itemsize=part_itemsize)):
                    # Same kernel pass also emits the edge->node segment
                    # sum (pad-safe sorted contract, identical to
                    # aggregate_edges_for_nodes on the rounded output) —
                    # the separate [E, dout] re-read disappears.
                    from ..ops.pallas.edge_update_g1 import \
                        fused_g1_edge_update_agg
                    h, agg = fused_g1_edge_update_agg(
                        ef, ef_ln, w0, src, tr, g.receivers, gb)
                    return h.astype(dtype), agg
                return fused_g1_edge_update(
                    ef, ef_ln, w0, src, tr,
                    g.receivers, gb).astype(dtype), None
        # senders are unsorted WITHIN each graph but graph-local: with
        # many small graphs the backward scatter can use per-graph edge
        # windows (windowed one-hot kernel) instead of an argsort.
        windows = None
        if (use_pallas() and G > 1 and N <= 256 * G):
            gi = jnp.arange(G + 1, dtype=jnp.int32)
            windows = (
                jnp.searchsorted(g.node_graph, gi).astype(jnp.int32),
                jnp.searchsorted(g.edge_graph, gi).astype(jnp.int32))
        ef_term = (ef, None) if ef_ln is None else (ef, None, ef_ln)
        return _linear_split(
            params["edgefn"], dtype,
            [ef_term, (nf, g.senders, None, False, windows),
             (nf, g.receivers, None, True),
             (gf, g.edge_graph, None, True)], rows=E), None
