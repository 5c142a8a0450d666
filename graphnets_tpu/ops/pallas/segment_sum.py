"""Sorted segment-sum as a Pallas TPU kernel — the hot aggregation op.

``jax.ops.segment_sum`` lowers to scatter-add, which on TPU costs ~13x the
memory-bound roofline (measured 239us vs ~18us for E=16384, D=384 on v5e;
12.8ms vs ~1.4ms at E=1M, D=256).  The framework's canonical edge order
(column-major adjacency, see ``graph.py``) makes ``receivers`` globally
sorted, i.e. the edge array is CSR-by-destination.  This kernel exploits
that: grid over segment tiles, each tile's edge range is contiguous; edge
features AND their segment ids are DMA'd in aligned fixed-size chunks and
reduced with a one-hot matmul on the MXU (``[TN, TE] @ [TE, D]``) — scatter
becomes dense compute.  The one-hot compares the chunk's segment ids
against the tile's segment range directly, so rows outside the tile match
no column and no masking is needed.

Host-side index work is O(grid): one ``searchsorted`` with ``grid + 1``
queries for the per-tile chunk bounds.  (A previous revision built the full
``[num_segments + 1]`` CSR indptr — that searchsorted alone cost 11 ms at
1M edges / 65k segments, ~8x the kernel itself.)

Requirements (checked by ``supports_sorted_segment_sum``; callers fall back
to ``jax.ops.segment_sum``): segment ids sorted ascending, ``E`` divisible
by 128, ``D`` lane-aligned.  Padded edges must target padded segments (the
batch layout guarantees this).

Backward: d/d x = gather(g, seg) — cheap in XLA; custom_vjp below.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sorted_segment_sum", "windowed_segment_sum",
           "supports_sorted_segment_sum"]


def _interpret() -> bool:
    from ...utils.config import get_config
    return get_config().pallas_interpret


def _pick(n, candidates):
    for c in candidates:
        if n % c == 0 and n >= c:
            return c
    return None


def supports_sorted_segment_sum(num_rows: int, num_segments: int,
                                dim: int) -> bool:
    return (dim % 128 == 0
            and _pick(num_rows, (512, 256, 128)) is not None
            and num_rows >= 128
            and num_segments >= 1)


def _kernel(starts_ref,     # scalar prefetch: [grid] tile edge-window starts
            ends_ref,       # scalar prefetch: [grid] tile edge-window ends
            x_hbm,          # [E, D] in ANY (manual DMA)
            seg_hbm,        # [1, E] int32 in ANY (manual DMA, lane-major)
            out_ref,        # [TN, D] VMEM block
            x_buf, seg_buf, acc_ref, sems, seg_sems,
            *, TE: int, TN: int, D: int, E: int):
    i = pl.program_id(0)
    start = starts_ref[i]
    end = ends_ref[i]
    n0 = i * TN

    acc_ref[:] = jnp.zeros((TN, D), jnp.float32)
    # Mosaic requires DMA offsets provably aligned: iterate TE-aligned
    # windows covering [start, end).  Rows whose segment id falls outside
    # [n0, n0 + TN) match no one-hot column, so no masking is needed.  The
    # chunk loop is a DYNAMIC fori_loop over pairs of chunks (so each
    # double-buffer slot index stays static): per-tile work is O(actual
    # chunks), not O(E / TE).
    start_al = (start // TE) * TE
    nchunks = pl.cdiv(end - start_al, TE)
    # Tile's segment ids down the sublane dim: [TN, 1].
    seg_rows = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + n0

    def off_of(k):
        # clamp (guards dead speculative prefetch), THEN assert alignment —
        # min of two TE-multiples is a TE-multiple, but Mosaic's prover
        # needs the multiple_of hint outermost.
        return pl.multiple_of(jnp.minimum(start_al + k * TE, E - TE), TE)

    def dma(k, slot):
        off = off_of(k)
        return (pltpu.make_async_copy(
                    x_hbm.at[pl.ds(off, TE), :], x_buf.at[slot],
                    sems.at[slot]),
                pltpu.make_async_copy(
                    seg_hbm.at[:, pl.ds(off, TE)], seg_buf.at[slot],
                    seg_sems.at[slot]))

    def start_dma(k, slot):
        a, b = dma(k, slot)
        a.start()
        b.start()

    def compute(k, slot):
        a, b = dma(k, slot)
        a.wait()
        b.wait()
        seg_row = seg_buf[slot]                            # [1, TE]
        onehot = jnp.where(seg_row == seg_rows, 1.0,
                           0.0).astype(x_buf.dtype)        # [TN, TE]
        # DEFAULT precision rounds f32 operands to bf16 on the MXU; for f32
        # inputs force HIGHEST so products keep full f32 mantissas (bf16
        # inputs are exact either way and stay single-pass).
        prec = (jax.lax.Precision.HIGHEST
                if x_buf.dtype == jnp.float32 else None)
        acc_ref[:] += jax.lax.dot_general(
            onehot, x_buf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)

    @pl.when(nchunks > 0)
    def _():
        start_dma(0, 0)

    def body(p, carry):
        k0 = 2 * p

        @pl.when(k0 + 1 < nchunks)
        def _():
            start_dma(k0 + 1, 1)

        compute(k0, 0)                      # k0 < nchunks by trip count

        @pl.when(k0 + 1 < nchunks)
        def _():
            @pl.when(k0 + 2 < nchunks)
            def _():
                start_dma(k0 + 2, 0)
            compute(k0 + 1, 1)
        return carry

    jax.lax.fori_loop(0, pl.cdiv(nchunks, 2), body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _forward(x: jax.Array, seg: jax.Array, num_segments: int,
             te: Optional[int] = None, tn: Optional[int] = None,
             windows: Optional[Tuple[jax.Array, jax.Array]] = None
             ) -> jax.Array:
    E, D = x.shape
    # Tile choices swept on v5e (benchmarks/exp_tn.py): small segment
    # counts want TN=128 (halves the one-hot FLOPs; the window per tile
    # stays short), huge inputs want TE=1024 (keeps the double-buffered
    # chunks small enough to overlap well).
    if te is None:
        te = _pick(E, (1024, 512, 256, 128)) if E > 262144             else _pick(E, (2048, 1024, 512, 256, 128))
    TE = te
    if tn is None:
        tn = (128 if num_segments <= 4096
              else (_pick(num_segments, (256, 128)) or 128))
    TN = tn
    pad_segments = ((num_segments + TN - 1) // TN) * TN
    grid = pad_segments // TN

    seg = seg.astype(jnp.int32)
    if windows is None:
        # Sorted ids: per-tile chunk bounds from grid + 1 searchsorted
        # queries (not a full [num_segments + 1] indptr); windows tile the
        # edge range, so starts[i] = ends[i-1].
        bounds = jnp.searchsorted(
            seg, jnp.arange(0, pad_segments + 1, TN, dtype=seg.dtype),
            side="left").astype(jnp.int32)                 # [grid + 1]
        starts, ends = bounds[:-1], bounds[1:]
    else:
        # Unsorted-WITHIN-GRAPH ids (e.g. senders): each node tile's edge
        # window spans the graphs whose node ranges intersect the tile —
        # every edge whose id lands in the tile lies inside, rows outside
        # match no one-hot column.  Windows of adjacent tiles may overlap
        # when a graph spans a tile boundary.
        node_off, edge_off = windows                       # [G + 1] each
        tile_lo = jnp.arange(0, pad_segments, TN, dtype=jnp.int32)
        g_lo = jnp.clip(jnp.searchsorted(node_off, tile_lo, side="right")
                        - 1, 0, node_off.shape[0] - 1)
        g_hi = jnp.clip(jnp.searchsorted(node_off, tile_lo + TN,
                                         side="left"),
                        0, node_off.shape[0] - 1)
        starts = jnp.take(edge_off, g_lo).astype(jnp.int32)
        ends = jnp.take(edge_off, g_hi).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, TE=TE, TN=TN, D=D, E=E),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TN, D), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TE, D), x.dtype),     # double-buffered chunks
                pltpu.VMEM((2, 1, TE), jnp.int32),   # chunk segment ids
                pltpu.VMEM((TN, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((pad_segments, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * TN * D,
            bytes_accessed=E * D * x.dtype.itemsize
            + pad_segments * D * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(starts, ends, x, seg.reshape(1, E))
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ss(x, seg, num_segments):
    return _forward(x, seg, num_segments)


def _ss_fwd(x, seg, num_segments):
    return _forward(x, seg, num_segments), seg


def _ss_bwd(num_segments, seg, g):
    # d segment_sum / d x = gather by (sorted) segment id; seg gets a zero
    # tangent.  The Pallas sorted-gather kernel is the exact transpose of
    # this kernel (gather.py) — use it for the cotangent expansion too.
    from .gather import sorted_gather
    return (sorted_gather(g, seg),
            jnp.zeros(seg.shape, jax.dtypes.float0))


_ss.defvjp(_ss_fwd, _ss_bwd)


def sorted_segment_sum(x: jax.Array, seg: jax.Array,
                       num_segments: int) -> jax.Array:
    """Segment sum over rows of ``x`` grouped by sorted ``seg`` ids.

    Falls back to ``jax.ops.segment_sum`` for unsupported shapes.
    """
    if not supports_sorted_segment_sum(x.shape[0], num_segments, x.shape[1]):
        return jax.ops.segment_sum(x, seg, num_segments=num_segments,
                                   indices_are_sorted=True)
    return _ss(x, seg, num_segments)


def windowed_segment_sum(x: jax.Array, seg: jax.Array, num_segments: int,
                         node_offsets: jax.Array,
                         edge_offsets: jax.Array) -> jax.Array:
    """Segment sum for ids that are unsorted WITHIN each graph but where
    edges of graph b can only target nodes of graph b (e.g. ``senders`` in
    the canonical batch layout).

    ``node_offsets`` / ``edge_offsets``: ``[G + 1]`` cumulative node / edge
    slot counts (graph b owns nodes ``node_offsets[b]:node_offsets[b+1]``
    and edges ``edge_offsets[b]:edge_offsets[b+1]``).  Each node tile
    reduces only the edge windows of the graphs it intersects — no argsort,
    no permutation gather.  Not differentiated (used as a BACKWARD scatter;
    see ``ops.scatter.take_rows_sorted_grad``).
    """
    if not supports_sorted_segment_sum(x.shape[0], num_segments, x.shape[1]):
        return jax.ops.segment_sum(x, seg, num_segments=num_segments)
    return _forward(x, seg, num_segments,
                    windows=(node_offsets, edge_offsets))
