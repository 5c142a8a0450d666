"""Random row-gather via deep per-row DMA pipelining — the round-5
experiment against XLA's dynamic gather for the SENDER term of the G=1
edge update (``models/gn_block._edge_update_split``).

``out[e] = table[idx[e]]`` for ARBITRARY in-range ``idx`` (no sortedness
assumption — the counterpart of ``gather.sorted_gather``, which exploits
the receiver ordering this gather does not have).

Design: grid over output tiles of TE rows; the whole index array rides in
SMEM via scalar prefetch; for each output row the kernel issues ONE
row-sized async copy HBM->VMEM directly into the output block, all TE
copies in flight together (the DMA engine reorders freely — each row is an
independent 512 B-class transfer), then drains the semaphore with
size-matched waits.  No compute units touch the data at all; the kernel is
pure DMA orchestration, so its floor is max(scalar issue rate, random-row
HBM bandwidth).

Rationale / measured context (see benchmarks/RESULTS.md "sender gather"):
XLA's take on this shape runs ~2.7x off the STREAMING roofline; whether
that is implementation slack or the random-access capability of HBM is
exactly what this kernel measures — it produces a second, independent
implementation of the same access pattern.  The in-flight window here is
TE rows (>= 512), enough to cover ~1 us of HBM latency at 512 B/row.

Precondition (unchecked): ``idx`` in ``[0, N)``.  Pads must point at real
rows (any row — the result rows are masked downstream), matching the
``mode="clip"`` behavior the callers rely on only for in-range ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather import _pick

__all__ = ["random_gather", "supports_random_gather"]

_UNROLL = 8


def _interpret() -> bool:
    from ...utils.config import get_config
    return get_config().pallas_interpret


def supports_random_gather(num_out: int, num_rows: int, dim: int) -> bool:
    te = _pick(num_out, (2048, 1024, 512))
    return (te is not None and dim % 128 == 0 and num_rows >= 1
            and te % _UNROLL == 0)


def _kernel(idx_ref,    # [1, TE] int32 tile in SMEM
            tab_hbm,    # [N, D] in ANY (DMA source)
            out_hbm,    # [E, D] in ANY (DMA destination — HBM rows are
            #             untiled, so 1-row slices are DMA-legal; tiled
            #             VMEM blocks are not)
            sem,        # single DMA semaphore, shared by all row copies
            *, TE: int, UNROLL: int):
    t = pl.program_id(0)
    base = t * TE

    def issue(i, c):
        for k in range(UNROLL):
            j = i * UNROLL + k
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[0, j], 1), :],
                out_hbm.at[pl.ds(base + j, 1), :],
                sem).start()
        return c

    jax.lax.fori_loop(0, TE // UNROLL, issue, 0)

    def drain(i, c):
        for k in range(UNROLL):
            # Size-matched wait: the copy object only determines the byte
            # count the semaphore is decremented by (all row copies are
            # identical [1, D] transfers), not WHICH transfer completes —
            # TE waits drain TE completions in any order.
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(0, 1), :],
                out_hbm.at[pl.ds(base, 1), :],
                sem).wait()
        return c

    jax.lax.fori_loop(0, TE // UNROLL, drain, 0)


def _forward(table: jax.Array, idx: jax.Array) -> jax.Array:
    N, D = table.shape
    E = idx.shape[0]
    TE = _pick(E, (2048, 1024, 512))
    grid = E // TE

    return pl.pallas_call(
        functools.partial(_kernel, TE=TE, UNROLL=_UNROLL),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, TE), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((E, D), table.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(E + E) * D * table.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx.reshape(1, E).astype(jnp.int32), table)


@jax.custom_vjp
def _rg(table, idx):
    return _forward(table, idx)


def _rg_fwd(table, idx):
    return _forward(table, idx), (idx, table.shape[0])


def _rg_bwd(res, g):
    idx, n = res
    # Unsorted scatter-add adjoint via the sorted route (argsort once,
    # CSE-d across uses of the same index array, then the sorted
    # segment-sum kernel) — same scheme as scatter.take_rows_sorted_grad.
    from ..scatter import segment_sum
    perm = jnp.argsort(idx)
    dx = segment_sum(jnp.take(g, perm, axis=0), jnp.take(idx, perm), n,
                     indices_are_sorted=True, sorted_pad_safe=True)
    return (dx.astype(g.dtype), jnp.zeros(idx.shape, jax.dtypes.float0))


_rg.defvjp(_rg_fwd, _rg_bwd)


def random_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for arbitrary in-range ``idx`` via per-row DMA;
    falls back to ``jnp.take`` for unsupported shapes."""
    if not supports_random_gather(idx.shape[0], table.shape[0],
                                  table.shape[1]):
        return jnp.take(table, idx, axis=0, mode="clip")
    return _rg(table, idx)
