"""Sorted row-gather as a Pallas TPU kernel.

``out[e] = table[idx[e]]`` for globally-sorted ``idx`` — the receiver-term
gather of the split-linear edge update (``models/gn_block._linear_split``)
and the backward of the sorted segment-sum.  XLA's dynamic gather on TPU
runs ~3-4x off the memory roofline at large row counts (measured 5.9 ms for
E=1M, D=256 bf16 vs ~1.6 ms of raw traffic, ``benchmarks/ablate_large.py``).

Because ``idx`` is sorted, the rows feeding one output tile come from a
CONTIGUOUS window of the table: the gather is the exact transpose of the
sorted segment-sum kernel (``segment_sum.py``).  Grid over OUTPUT edge
tiles (static writes); each tile walks its table window in TN-aligned
chunks with double-buffered manual DMA and materializes the gather as a
one-hot matmul on the MXU::

    onehot[TN, TE] = (chunk_row_ids == idx_tile)     # [TN,1] vs [1,TE]
    acc[TE, D]    += onehot^T @ chunk[TN, D]         # dot_general ((0),(0))

Rows of a chunk outside the tile's id range match no column, so alignment
slop needs no masking.  Total DMA traffic is ~``N + 2 * grid * TN`` table
rows (each row read about once, plus per-tile alignment), vs the output's
``E`` rows — for E >> N the table re-read is noise.

Semantics vs ``jnp.take``: table values pass through the one-hot matmul's
f32 accumulate with exactly one product each, so bf16 rows are exact and
f32 rows are exact under ``Precision.HIGHEST`` (forced, like the
segment-sum kernel).

Backward: ``d table = sorted_segment_sum(g, idx)`` — the existing kernel.

Replaces the reference's src/dst node->edge broadcaster matmuls
(``/root/reference/src/gngraphbatch.jl:194-211``) for the sorted index
arrays of the canonical layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sorted_gather", "supports_sorted_gather"]


def _interpret() -> bool:
    from ...utils.config import get_config
    return get_config().pallas_interpret


def _pick(n, candidates):
    for c in candidates:
        if n % c == 0 and n >= c:
            return c
    return None


def _pick_tn(num_rows: int, num_out: int, te: int) -> int:
    """Chunk height: ~2x the expected per-tile id span (``te * N / E``),
    clamped to [32, 512] and to a divisor of the table height (DMA offsets
    are TN-aligned and clamped to ``N - TN``, so ``N % TN == 0``)."""
    span = max(32, 2 * te * num_rows // max(num_out, 1))
    tn = 32
    while tn * 2 <= min(span, 512):
        tn *= 2
    while tn > 32 and num_rows % tn != 0:
        tn //= 2
    return tn


_VMEM_BUDGET = 12 << 20  # same headroom rule as ops.pallas.ln_linear


def supports_sorted_gather(num_out: int, num_rows: int, dim: int,
                           itemsize: int = 4) -> bool:
    """Shape AND VMEM-fit gate (table chunks are double-buffered and the
    accumulator/addend tiles are f32, so large ``dim`` can blow the ~16 MB
    VMEM at compile time — e.g. D >= 2048 f32 with TE=TN=512)."""
    te = _pick(num_out, (512, 256, 128))
    if (dim % 128 != 0 or te is None or num_rows % 32 != 0
            or num_rows < 32):
        return False
    tn = _pick_tn(num_rows, num_out, te)
    vmem = (2 * tn * dim * itemsize   # double-buffered table chunks
            + te * dim * 4            # f32 accumulator
            + te * dim * itemsize     # output tile
            + te * dim * 4)           # addend tile (worst case f32)
    return vmem <= _VMEM_BUDGET


def _debug_check_sorted_in_range(idx, num_rows: int):
    """GRAPHNETS_TPU_DEBUG=1: enforce the kernel's unchecked preconditions
    — ids ascending and within ``[0, num_rows)``.  Violations make the
    kernel silently diverge from ``jnp.take(mode="clip")`` (out-of-range
    columns produce zeros; the clamped chunk offset can double-count
    in-range ids), so debug mode raises instead."""
    import numpy as np

    def cb(idx):
        a = np.asarray(idx)
        if len(a) > 1 and (np.diff(a) < 0).any():
            k = int(np.argmax(np.diff(a) < 0))
            raise ValueError(
                "sorted_gather: idx is not ascending "
                f"(idx[{k}]={a[k]} > idx[{k + 1}]={a[k + 1]}); the kernel "
                "requires the canonical sorted order.")
        if len(a) and (int(a.min()) < 0 or int(a.max()) >= num_rows):
            raise ValueError(
                "sorted_gather: idx out of range [0, "
                f"{num_rows}): min={int(a.min())} max={int(a.max())}. "
                "Out-of-range ids would read as zeros (not clip).")

    if isinstance(idx, jax.core.Tracer):
        jax.debug.callback(cb, idx)
    else:
        cb(idx)


def _kernel(starts_ref,     # scalar prefetch: [grid] aligned window starts
            ends_ref,       # scalar prefetch: [grid] window ends
            tab_hbm,        # [N, D] in ANY (manual DMA)
            idx_ref,        # [1, TE] int32 VMEM block (pipelined)
            *rest,          # [addend_ref,] out_ref, tab_buf, acc_ref, sems
            TE: int, TN: int, D: int, N: int, has_addend: bool):
    if has_addend:
        addend_ref, out_ref, tab_buf, acc_ref, sems = rest
    else:
        out_ref, tab_buf, acc_ref, sems = rest
        addend_ref = None
    i = pl.program_id(0)
    start_al = starts_ref[i]            # already TN-aligned on host
    end = ends_ref[i]

    # Fused addend: out = table[idx] + addend in the same HBM pass —
    # initializing the accumulator with the addend block costs nothing
    # extra and saves a separate [E, D] read-modify-write stream.
    if addend_ref is not None:
        acc_ref[:] = addend_ref[:].astype(jnp.float32)
    else:
        acc_ref[:] = jnp.zeros((TE, D), jnp.float32)
    nchunks = pl.cdiv(end - start_al, TN)
    idx_row = idx_ref[:]                                   # [1, TE]

    def off_of(k):
        return pl.multiple_of(jnp.minimum(start_al + k * TN, N - TN), TN)

    def dma(k, slot):
        off = off_of(k)
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(off, TN), :], tab_buf.at[slot], sems.at[slot])

    def compute(k, slot):
        dma(k, slot).wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + off_of(k)
        onehot = jnp.where(rows == idx_row, 1.0,
                           0.0).astype(tab_buf.dtype)      # [TN, TE]
        prec = (jax.lax.Precision.HIGHEST
                if tab_buf.dtype == jnp.float32 else None)
        acc_ref[:] += jax.lax.dot_general(
            onehot, tab_buf[slot],
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(p, carry):
        k0 = 2 * p

        @pl.when(k0 + 1 < nchunks)
        def _():
            dma(k0 + 1, 1).start()

        compute(k0, 0)

        @pl.when(k0 + 1 < nchunks)
        def _():
            @pl.when(k0 + 2 < nchunks)
            def _():
                dma(k0 + 2, 0).start()
            compute(k0 + 1, 1)
        return carry

    jax.lax.fori_loop(0, pl.cdiv(nchunks, 2), body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _forward(table: jax.Array, idx: jax.Array,
             addend=None) -> jax.Array:
    N, D = table.shape
    E = idx.shape[0]
    TE = _pick(E, (512, 256, 128))
    TN = _pick_tn(N, E, TE)
    grid = E // TE

    idx = idx.astype(jnp.int32)
    idx2 = idx.reshape(grid, TE)
    # Window per tile: [idx[first], idx[last] + 1) — sorted ids make these
    # the min/max.  Align starts down to TN here so the kernel's offsets
    # are provably TN-multiples.
    starts = ((idx2[:, 0] // TN) * TN).astype(jnp.int32)
    ends = (idx2[:, -1] + 1).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, TE), lambda i, *_: (0, i)),
    ]
    args = [starts, ends, table, idx.reshape(1, E)]
    alias = {}
    if addend is not None:
        in_specs.append(pl.BlockSpec((TE, D), lambda i, *_: (i, 0)))
        args.append(addend)
        # Donate the addend stream into the output when the dtypes match
        # (index 4 counts the two scalar-prefetch args): the [E, D] addend
        # is dead after this kernel (not a residual — see _sg_add_fwd) and
        # the in-place write pattern is ~2x faster on v5e than a fresh
        # [E, D] output buffer (RESULTS.md "HBM aliasing").
        out_dt = jnp.promote_types(table.dtype, addend.dtype)
        if addend.dtype == out_dt:
            alias = {4: 0}

    return pl.pallas_call(
        functools.partial(_kernel, TE=TE, TN=TN, D=D, N=N,
                          has_addend=addend is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TE, D), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TN, D), table.dtype),
                pltpu.VMEM((TE, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (E, D), table.dtype if addend is None
            else jnp.promote_types(table.dtype, addend.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * TN * D,
            bytes_accessed=(E + N) * D * table.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
        input_output_aliases=alias,
    )(*args)


@jax.custom_vjp
def _sg(table, idx):
    return _forward(table, idx)


def _sg_fwd(table, idx):
    return _forward(table, idx), (idx, table.shape[0])


def _sg_bwd(res, g):
    idx, n = res
    from .segment_sum import sorted_segment_sum
    return (sorted_segment_sum(g, idx, n).astype(g.dtype),
            jnp.zeros(idx.shape, jax.dtypes.float0))


_sg.defvjp(_sg_fwd, _sg_bwd)


@jax.custom_vjp
def _sg_add(table, idx, addend):
    return _forward(table, idx, addend)


def _sg_add_fwd(table, idx, addend):
    # dtype carriers: custom_vjp residuals must be JAX types, so dtypes
    # ride in zero-size arrays.
    return (_forward(table, idx, addend),
            (idx, table.shape[0], jnp.zeros((0,), table.dtype),
             jnp.zeros((0,), addend.dtype)))


def _sg_add_bwd(res, g):
    idx, n, tdt, adt = res
    from .segment_sum import sorted_segment_sum
    return (sorted_segment_sum(g, idx, n).astype(tdt.dtype),
            jnp.zeros(idx.shape, jax.dtypes.float0),
            g.astype(adt.dtype))


_sg_add.defvjp(_sg_add_fwd, _sg_add_bwd)


def sorted_gather_add(table: jax.Array, idx: jax.Array,
                      addend: jax.Array) -> jax.Array:
    """``table[idx] + addend`` fused in one kernel pass for ascending
    ``idx`` — the accumulator tile initializes from the addend block, so
    the separate [E, D] add stream disappears.  The f32 accumulator makes
    the sum exact before the single output rounding (to
    ``promote_types(table, addend)``).  Falls back to the unfused ops for
    unsupported shapes.

    Precondition (unchecked outside GRAPHNETS_TPU_DEBUG=1): ``idx``
    ascending and in ``[0, len(table))`` — see :func:`sorted_gather`."""
    if not supports_sorted_gather(idx.shape[0], table.shape[0],
                                  table.shape[1],
                                  table.dtype.itemsize):
        out = jnp.take(table, idx, axis=0, indices_are_sorted=True,
                       mode="clip")
        dt = jnp.promote_types(table.dtype, addend.dtype)
        return out.astype(dt) + addend.astype(dt)
    from ...utils.config import debug_checks
    if debug_checks():
        _debug_check_sorted_in_range(idx, table.shape[0])
    return _sg_add(table, idx, addend)


def sorted_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for ascending ``idx``; falls back to ``jnp.take`` for
    unsupported shapes.

    Precondition (enforced only under GRAPHNETS_TPU_DEBUG=1): ``idx``
    ascending and within ``[0, len(table))``.  Unlike
    ``jnp.take(mode="clip")``, out-of-range ids read as ZEROS and unsorted
    ids can double-count rows re-read by the clamped chunk offset — the
    batch layout guarantees the contract; custom callers must too."""
    if not supports_sorted_gather(idx.shape[0], table.shape[0],
                                  table.shape[1],
                                  table.dtype.itemsize):
        return jnp.take(table, idx, axis=0, indices_are_sorted=True,
                        mode="clip")
    from ...utils.config import debug_checks
    if debug_checks():
        _debug_check_sorted_in_range(idx, table.shape[0])
    return _sg(table, idx)
