"""Gather / segment-aggregation primitives — the TPU-native replacement for
the reference's seven dense "broadcaster" matmuls
(``/root/reference/src/gngraphbatch.jl:136-211``).

Each function documents which broadcaster it replaces.  All aggregations mask
padded slots so padding can never contaminate real slots (the broadcasters'
zero columns played this role in the reference).

These are the pure-XLA reference implementations; ``graphnets_tpu.ops.pallas``
provides fused kernels for the same contracts and is validated against these.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "gather_nodes",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "aggregate_edges_for_nodes",
    "aggregate_edges_for_globals",
    "aggregate_nodes_for_globals",
    "broadcast_globals_to_edges",
    "broadcast_globals_to_nodes",
]


def _mask_rows(x: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return x
    return jnp.where(mask[:, None], x, jnp.zeros((), x.dtype))


def _host_check_sorted_pad_safe(seg, mask):
    """Raise if the sorted-pad-safe contract is violated (debug mode).

    Contract (required by the mask-free Pallas kernel,
    ``ops.pallas.segment_sum``): segment ids ascending, and padded rows
    (mask False) target only segments no real row targets — so skipping
    the mask cannot leak padding into real outputs.
    """
    import numpy as np
    seg = np.asarray(seg)
    if len(seg) > 1 and (np.diff(seg) < 0).any():
        k = int(np.argmax(np.diff(seg) < 0))
        raise ValueError(
            "segment_sum(sorted_pad_safe=True): segment ids are not sorted "
            f"ascending (ids[{k}]={seg[k]} > ids[{k + 1}]={seg[k + 1]}). "
            "Sorted order is the canonical edge order produced by batch(); "
            "pass indices_are_sorted=False / sorted_pad_safe=False for "
            "arbitrary-order ids.")
    if mask is not None:
        mask = np.asarray(mask)
        real, padded = seg[mask], seg[~mask]
        if len(real) and len(padded):
            overlap = np.intersect1d(np.unique(real), np.unique(padded))
            if overlap.size:
                raise ValueError(
                    "segment_sum(sorted_pad_safe=True): padded rows target "
                    f"segment(s) {overlap[:8].tolist()} that real rows also "
                    "target — padding would leak into real outputs. "
                    "batch() guarantees padded edges point at a padding "
                    "node (in the uniform slot layout, each slot's own "
                    "last node slot); check custom GraphsTuple "
                    "construction.")


def _check_sorted_pad_safe(seg, mask):
    """Debug-mode contract check that works both eagerly and under jit."""
    if isinstance(seg, jax.core.Tracer) or isinstance(mask, jax.core.Tracer):
        args = (seg,) if mask is None else (seg, mask)

        def cb(seg, mask=None):
            _host_check_sorted_pad_safe(seg, mask)

        jax.debug.callback(cb, *args)
    else:
        _host_check_sorted_pad_safe(seg, mask)


import functools as _functools


def _gather_sorted_fwd(x: Array, idx: Array) -> Array:
    """Forward gather for ASCENDING ids: the Pallas windowed one-hot
    kernel when available (XLA's dynamic gather runs ~3-4x off the memory
    roofline at large row counts; see ``ops/pallas/gather.py``)."""
    from ..utils.config import use_pallas
    if use_pallas():
        from .pallas.gather import sorted_gather
        return sorted_gather(x, idx)
    return jnp.take(x, idx, axis=0, indices_are_sorted=True, mode="clip")


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _take_rows(x: Array, idx: Array, idx_sorted: bool) -> Array:
    if idx_sorted:
        return _gather_sorted_fwd(x, idx)
    return jnp.take(x, idx, axis=0, indices_are_sorted=idx_sorted,
                    mode="clip")


def _take_rows_fwd(x, idx, idx_sorted):
    return _take_rows(x, idx, idx_sorted), (idx, x.shape[0])


def _take_rows_bwd(idx_sorted, res, g):
    idx, n = res
    if idx_sorted:
        # Canonical-order indices (receivers / edge_graph / node_graph are
        # ascending by construction): the cotangent rows are already in
        # segment order — reduce directly, no per-step argsort.
        dx = segment_sum(g, idx, n, indices_are_sorted=True,
                         sorted_pad_safe=True)
    else:
        # One stable key/value sort yields BOTH the sorted ids (the segment
        # ids) and the permutation — `argsort` + `idx[perm]` would re-read
        # the ids through a 4-byte random gather (~7.5 ms/step at E=1M,
        # measured r5b) for values the sort already produced.  `perm` is a
        # permutation by construction, so the cotangent gather needs no
        # bounds select either (`promise_in_bounds` drops the ~1.6 ms
        # `select_n` pass per call).
        iota = jnp.arange(idx.shape[0], dtype=idx.dtype)
        seg, perm = jax.lax.sort_key_val(idx, iota, is_stable=True)
        gs = g.at[perm].get(unique_indices=True, mode="promise_in_bounds")
        dx = segment_sum(gs, seg, n, indices_are_sorted=True,
                         sorted_pad_safe=True)
    return dx.astype(g.dtype), None


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def _take_rows_win(x: Array, idx: Array, win_n: Array,
                   win_e: Array) -> Array:
    return jnp.take(x, idx, axis=0, mode="clip")


def _take_rows_win_fwd(x, idx, win_n, win_e):
    return _take_rows_win(x, idx, win_n, win_e), \
        (idx, win_n, win_e, x.shape[0])


def _take_rows_win_bwd(res, g):
    # Unsorted-within-graph ids with per-graph edge windows (senders): the
    # windowed one-hot kernel reduces without argsort or a permutation
    # gather.
    idx, win_n, win_e, n = res
    from ..utils.config import use_pallas
    if use_pallas():
        from .pallas.segment_sum import windowed_segment_sum
        dx = windowed_segment_sum(g, idx, n, win_n, win_e)
    else:
        dx = jax.ops.segment_sum(
            g.astype(jnp.float32) if g.dtype == jnp.bfloat16 else g,
            idx, num_segments=n)
    return dx.astype(g.dtype), None, None, None


_take_rows_win.defvjp(_take_rows_win_fwd, _take_rows_win_bwd)


def take_rows_sorted_grad(x: Array, idx: Array, idx_sorted: bool = False,
                          windows=None) -> Array:
    """``x[idx]`` whose backward scatter-add runs SORTED.

    The adjoint of a row gather is a scatter-add of the output cotangent by
    ``idx`` — which XLA lowers to a serial scatter (~13x off roofline on
    TPU).  Here the backward instead sorts the cotangent rows by ``idx``
    (one argsort of ``idx``, CSE-d across blocks sharing the index array)
    and reduces with the CSR one-hot-matmul Pallas kernel / sorted
    ``segment_sum``.  ``idx_sorted=True`` declares the ids already
    ascending (canonical edge order), skipping the argsort entirely.
    ``windows=(node_offsets, edge_offsets)`` (``[G+1]`` each) declares ids
    unsorted within graphs but graph-local (senders): the backward reduces
    with the windowed one-hot kernel — no argsort AND no permutation
    gather.  Numerically these change only the intra-segment accumulation
    order (all accumulate in f32).
    """
    if windows is not None and not idx_sorted:
        return _take_rows_win(x, idx, windows[0], windows[1])
    return _take_rows(x, idx, idx_sorted)


def gather_nodes(nf: Array, idx: Array, idx_sorted: bool = False,
                 windows=None) -> Array:
    """``nf[idx]`` — replaces ``batched_mul(nf, src/dstnode2edge_broadcaster)``
    (``/root/reference/src/edgefninput.jl:4-5``).  O(E·DN) HBM traffic instead
    of an O(PN·PN²) dense matmul.  Backward scatter-add runs sorted (see
    :func:`take_rows_sorted_grad`)."""
    from ..utils.config import get_config
    if get_config().sorted_scatter_grad:
        return take_rows_sorted_grad(nf, idx, idx_sorted, windows)
    return jnp.take(nf, idx, axis=0, indices_are_sorted=idx_sorted,
                    unique_indices=False, mode="clip")


def segment_sum(x: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None,
                indices_are_sorted: bool = True,
                sorted_pad_safe: bool = False) -> Array:
    """Masked ``jax.ops.segment_sum`` with f32 accumulation.

    ``indices_are_sorted`` defaults True: canonical edge order is sorted by
    (graph, receiver), and node/edge->graph segment ids are sorted by
    construction.

    ``sorted_pad_safe=True`` declares the batch-layout invariant that padded
    rows target padded segments (so the mask is redundant) and the ids are
    sorted; with Pallas enabled this routes to the CSR one-hot-matmul kernel
    (``ops.pallas.segment_sum``), ~10x faster than XLA scatter-add on TPU.
    Under ``GRAPHNETS_TPU_DEBUG=1`` the invariant is enforced (raises on
    violation, eagerly or via ``jax.debug.callback`` under jit); otherwise
    violating it silently corrupts the Pallas path's output.
    """
    from ..utils.config import use_pallas, debug_checks
    if sorted_pad_safe and debug_checks():
        _check_sorted_pad_safe(segment_ids, mask)
    if sorted_pad_safe and use_pallas() and num_segments > 64:
        from .pallas.segment_sum import (sorted_segment_sum,
                                         supports_sorted_segment_sum)
        if supports_sorted_segment_sum(x.shape[0], num_segments,
                                       x.shape[-1]):
            return sorted_segment_sum(x, segment_ids, num_segments)
    # (A measured r5b negative result: special-casing num_segments == 1 as a
    # masked column sum — instead of the one-hot HIGHEST dot below — LOSES
    # ~2.3 ms/step on the 1M-edge training workload.  XLA fuses the one-hot
    # dot's operand cast into the producer epilogue, while a standalone
    # reduce forces the [E, D] stream to materialize twice for its two
    # consumers.  Keep the one-hot path for every small-segment case.)
    if num_segments <= 64 and x.shape[0] >= 4 * num_segments:
        # Few segments (graph-level pools): a one-hot matmul beats
        # scatter-add by >10x on TPU and needs no sortedness.
        oh = (segment_ids[:, None]
              == jnp.arange(num_segments, dtype=segment_ids.dtype)[None, :])
        if mask is not None:
            oh = oh & mask[:, None]
        out = jax.lax.dot_general(
            oh.astype(jnp.float32), x.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return out.astype(x.dtype)
    x = _mask_rows(x, mask)
    acc = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    out = jax.ops.segment_sum(acc, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return out.astype(x.dtype)


def segment_mean(x: Array, segment_ids: Array, num_segments: int,
                 mask: Optional[Array] = None,
                 indices_are_sorted: bool = True) -> Array:
    s = segment_sum(x, segment_ids, num_segments, mask, indices_are_sorted)
    ones = jnp.ones((x.shape[0],), jnp.float32)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                                 indices_are_sorted=indices_are_sorted)
    return s / jnp.maximum(counts, 1.0)[:, None].astype(s.dtype)


def segment_max(x: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None,
                indices_are_sorted: bool = True) -> Array:
    neg = jnp.full((), jnp.finfo(x.dtype).min, x.dtype)
    if mask is not None:
        x = jnp.where(mask[:, None], x, neg)
    out = jax.ops.segment_max(x, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    # Empty / fully-masked segments come back as the fill value -> report 0.
    return jnp.where(out <= neg, jnp.zeros((), x.dtype), out)


# -- GN-block-specific aggregations (broadcaster replacements) --------------


def aggregate_edges_for_nodes(ef: Array, receivers: Array, num_nodes: int,
                              edge_mask: Optional[Array]) -> Array:
    """Sum of incoming-edge features per destination node — replaces
    ``batched_mul(ef, edge2node_broadcaster)``
    (``/root/reference/src/nodefninput.jl:3``,
    ``/root/reference/src/gngraphbatch.jl:158-170``)."""
    return segment_sum(ef, receivers, num_nodes, edge_mask,
                       indices_are_sorted=False, sorted_pad_safe=True)


def aggregate_edges_for_globals(ef: Array, edge_graph: Array, num_graphs: int,
                                edge_mask: Optional[Array],
                                mask_aliases_real: bool = False) -> Array:
    """Sum-pool over real edges per graph — replaces
    ``batched_mul(ef, edge2graph_broadcaster)``
    (``/root/reference/src/graphfninput.jl:3``).

    ``mask_aliases_real`` (``GraphsTuple.pad_aliases_real``): the uniform
    slot layout gives padded edges their owning slot's graph id, so the
    mask is load-bearing here — zero the padded rows BEFORE the sorted
    reduction (sharing a segment with zeros is then harmless)."""
    if mask_aliases_real and edge_mask is not None:
        ef = _mask_rows(ef, edge_mask)
        edge_mask = None
    return segment_sum(ef, edge_graph, num_graphs, edge_mask,
                       indices_are_sorted=True, sorted_pad_safe=True)


def aggregate_nodes_for_globals(nf: Array, node_graph: Array, num_graphs: int,
                                node_mask: Optional[Array],
                                mask_aliases_real: bool = False) -> Array:
    """Sum-pool over real nodes per graph — replaces
    ``batched_mul(nf, node2graph_broadcaster)``
    (``/root/reference/src/graphfninput.jl:4``).  See
    :func:`aggregate_edges_for_globals` for ``mask_aliases_real``."""
    if mask_aliases_real and node_mask is not None:
        nf = _mask_rows(nf, node_mask)
        node_mask = None
    return segment_sum(nf, node_graph, num_graphs, node_mask,
                       indices_are_sorted=True, sorted_pad_safe=True)


def broadcast_globals_to_edges(gf: Array, edge_graph: Array) -> Array:
    """Tile graph features onto edge slots — replaces
    ``batched_mul(gf, graph2edge_broadcaster)``
    (``/root/reference/src/edgefninput.jl:6``).  ``edge_graph`` is sorted by
    construction, so the backward reduction runs argsort-free."""
    from ..utils.config import get_config
    if get_config().sorted_scatter_grad:
        return take_rows_sorted_grad(gf, edge_graph, idx_sorted=True)
    return jnp.take(gf, edge_graph, axis=0, mode="clip")


def broadcast_globals_to_nodes(gf: Array, node_graph: Array) -> Array:
    """Tile graph features onto node slots — replaces
    ``batched_mul(gf, graph2node_broadcaster)``
    (``/root/reference/src/nodefninput.jl:5``).  ``node_graph`` is sorted by
    construction, so the backward reduction runs argsort-free."""
    from ..utils.config import get_config
    if get_config().sorted_scatter_grad:
        return take_rows_sorted_grad(gf, node_graph, idx_sorted=True)
    return jnp.take(gf, node_graph, axis=0, mode="clip")
