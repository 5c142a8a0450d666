"""Fused single-graph (G=1) edge update — one HBM pass for the 1M-edge path.

The uniform-layout SDDMM kernel (``edge_update.py``) needs G >= 2 with a
per-graph slot shape; the large-graph config (BASELINE item: "SpMM/SDDMM
at speed-of-light per chip") is exactly G=1, where round 3 still composed
the edge update from separate streams: ``ln_matmul`` (read ef + read acc +
write), a sorted-gather-with-addend pass (read acc + write), and the
XLA sender gather (write src) — ~3.4 GB of HBM traffic for a ~1.6 GB
problem (measured 11.5 ms net at E=1M, D=256; ``benchmarks/RESULTS.md``
ablation).

This kernel computes, per edge tile, in ONE pass::

    h_ef[e] = LN(ef[e]) @ W0  +  src[e]  +  tr[rl[e]]  +  gb

* ``ef`` tile is normalized in VMEM and fed straight to the MXU
  (same math as ``ln_linear.ln_matmul``; ``has_ln=False`` skips the LN
  for bare GNBlocks).
* ``src`` is the sender term ``(nf @ W_src)[senders]`` — senders are
  random in canonical (receiver-sorted) order, so the gather itself is
  left to XLA (the one remaining random-access stream) and its result
  streams through as a pipelined addend tile.
* ``tr = nf @ W_dst`` is gathered IN-KERNEL by the receiver ids: rl is
  globally ascending in canonical order, so each tile's rows come from a
  contiguous table window — the double-buffered windowed DMA + one-hot
  MXU machinery of ``gather.py``.
* ``gb`` is the per-graph global term + bias, a single f32 row (G=1).

Traffic: read ef + read src + read ~N table rows + write h_ef
≈ 1.6 GB at E=1M/D=256/bf16 vs ~3.4 GB composed.  Semantics (rounding
points) match the composed path exactly: all partials accumulate in f32,
one output rounding.

Backward composes existing pieces: ``ln_linear._backward`` (flash-style
LN+matmul pullback) for d ef / d scale / d bias / d W0; the sorted
segment-sum kernel for d tr; identity for d src; a row-sum for d gb.

Reference semantics preserved: `/root/reference/src/edgefninput.jl:1-8`
(concat order ef, src, dst, g) + `src/gnblock.jl:56` (single Dense).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather import _pick, _pick_tn

__all__ = ["fused_g1_edge_update", "supports_g1_edge_update"]

_VMEM_BUDGET = 12 << 20


def _interpret() -> bool:
    from ...utils.config import get_config
    return get_config().pallas_interpret


def _tiles(num_edges: int, num_nodes: int):
    """Tile choice swept on v5e (1M edges, D=256): big TE amortizes the
    per-tile window-DMA latency (the kernel is latency-bound on small
    chunks at TE=512: 6.15 ms vs 4.99 ms at TE=2048), and TN=128 beats
    bigger chunks (less table re-read per tile).  TE capped at 2048 —
    4096 exceeds the 16M scoped-vmem limit at D=256."""
    te = (_pick(num_edges, (2048, 1024, 512, 256, 128))
          if num_edges > 262144 else _pick(num_edges, (512, 256, 128)))
    if te is None:
        return None, None
    tn = min(_pick_tn(num_nodes, num_edges, te), 128)
    return te, tn


def supports_g1_edge_update(num_edges: int, num_nodes: int, de: int,
                            dout: int, itemsize: int = 2) -> bool:
    te, tn = _tiles(num_edges, num_nodes)
    if (te is None or de % 128 != 0 or dout % 128 != 0
            or num_nodes % 32 != 0 or num_nodes < 32):
        return False
    vmem = (te * de * itemsize          # ef tile
            + te * dout * itemsize      # src tile
            + 2 * tn * dout * itemsize  # double-buffered tr chunks
            + te * dout * 4             # f32 accumulator
            + te * dout * itemsize      # out tile
            + de * dout * itemsize      # W0
            + 2 * de * 4 + dout * 4)    # scale/bias/gb rows
    return vmem <= _VMEM_BUDGET


def _ln_rows(xf, scale, bias):
    # nn.core.LayerNorm convention: (x - mu) / (std + eps), safe sqrt.
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    safe = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
    return (xf - mu) / (std + 1e-5) * scale + bias


def _kernel(starts_ref, ends_ref,       # scalar prefetch: tr window bounds
            tab_hbm,                    # [N, dout] tr table in ANY
            idx_ref,                    # [1, TE] int32 rl tile
            ef_ref,                     # [TE, de] edge features tile
            src_ref,                    # [TE, dout] sender-term tile
            s_ref, b_ref,               # [1, de] f32 LN scale/bias
            w_ref,                      # [de, dout] W0
            gb_ref,                     # [1, dout] f32 graph term + bias
            out_ref,                    # [TE, dout]
            tab_buf, acc_ref, sems,
            *, TE: int, TN: int, D: int, N: int, has_ln: bool):
    i = pl.program_id(0)
    start_al = starts_ref[i]
    end = ends_ref[i]

    # acc starts from the streamed sender term + the broadcast row.
    acc_ref[:] = src_ref[:].astype(jnp.float32) + gb_ref[:]

    nchunks = pl.cdiv(end - start_al, TN)
    idx_row = idx_ref[:]

    def off_of(k):
        return pl.multiple_of(jnp.minimum(start_al + k * TN, N - TN), TN)

    def dma(k, slot):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(off_of(k), TN), :], tab_buf.at[slot],
            sems.at[slot])

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

    # ef term: LN in VMEM -> MXU (same rounding points as ln_matmul).
    x = ef_ref[:]
    if has_ln:
        xn = _ln_rows(x.astype(jnp.float32), s_ref[:],
                      b_ref[:]).astype(x.dtype)
    else:
        xn = x
    acc = acc_ref[:] + jax.lax.dot_general(
        xn, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _forward(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    E, de = ef.shape
    N, dout = tr.shape
    TE, TN = _tiles(E, N)
    grid = E // TE

    rl = rl.astype(jnp.int32)
    idx2 = rl.reshape(grid, TE)
    starts = ((idx2[:, 0] // TN) * TN).astype(jnp.int32)
    ends = (idx2[:, -1] + 1).astype(jnp.int32)

    row = lambda i, *_: (i, 0)
    full = lambda i, *_: (0, 0)
    return pl.pallas_call(
        functools.partial(_kernel, TE=TE, TN=TN, D=dout, N=N,
                          has_ln=has_ln),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),              # tr table
                pl.BlockSpec((1, TE), lambda i, *_: (0, i)),    # rl tile
                pl.BlockSpec((TE, de), row),                    # ef
                pl.BlockSpec((TE, dout), row),                  # src
                pl.BlockSpec((1, de), full),                    # scale
                pl.BlockSpec((1, de), full),                    # bias
                pl.BlockSpec((de, dout), full),                 # W0
                pl.BlockSpec((1, dout), full),                  # gb
            ],
            out_specs=pl.BlockSpec((TE, dout), row,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TN, dout), tr.dtype),
                pltpu.VMEM((TE, dout), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((E, dout), ef.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * de * dout + 2 * E * TN * dout,
            bytes_accessed=(E * (de + 2 * dout) + N * dout)
            * ef.dtype.itemsize,
            transcendentals=E,
        ),
        interpret=_interpret(),
    )(starts, ends, tr, rl.reshape(1, E), ef, src,
      scale[None, :].astype(jnp.float32), bias[None, :].astype(jnp.float32),
      w0.astype(ef.dtype), gb[None, :].astype(jnp.float32))


def _reference(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    """Composed-op reference (same rounding points): used as fallback and
    as the oracle in tests."""
    if has_ln:
        from .ln_linear import ln_matmul_reference
        part = ln_matmul_reference(ef, scale, bias, w0)
    else:
        part = jax.lax.dot_general(
            ef, w0.astype(ef.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = (src.astype(jnp.float32) + gb.astype(jnp.float32)
           + jnp.take(tr, rl, axis=0, indices_are_sorted=True,
                      mode="clip").astype(jnp.float32) + part)
    return acc.astype(ef.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _op(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    if not supports_g1_edge_update(ef.shape[0], tr.shape[0], ef.shape[1],
                                   tr.shape[1], ef.dtype.itemsize):
        return _reference(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
    return _forward(ef, scale, bias, w0, src, tr, rl, gb, has_ln)


def _op_fwd(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    return (_op(ef, scale, bias, w0, src, tr, rl, gb, has_ln),
            (ef, scale, bias, w0, rl, tr.shape[0],
             jnp.zeros((0,), src.dtype), jnp.zeros((0,), tr.dtype),
             jnp.zeros((0,), gb.dtype)))


def _op_bwd(has_ln, res, g):
    ef, scale, bias, w0, rl, n_nodes, sdt, tdt, gdt = res
    from .segment_sum import sorted_segment_sum
    d_src = g.astype(sdt.dtype)
    d_tr = sorted_segment_sum(g, rl, n_nodes).astype(tdt.dtype)
    d_gb = jnp.sum(g.astype(jnp.float32), axis=0).astype(gdt.dtype)
    if has_ln:
        from .ln_linear import _backward, ln_matmul_reference, \
            supports_ln_matmul
        if supports_ln_matmul(ef.shape[0], ef.shape[1], w0.shape[1]):
            d_ef, ds, db, dw = _backward(ef, scale, bias, w0, g)
            ds, db, dw = (ds.astype(scale.dtype), db.astype(bias.dtype),
                          dw.astype(w0.dtype))
        else:
            _, vjp = jax.vjp(
                lambda x_, s_, b_, w_: ln_matmul_reference(x_, s_, b_, w_),
                ef, scale, bias, w0)
            d_ef, ds, db, dw = vjp(g.astype(jnp.float32))
    else:
        d_ef = jax.lax.dot_general(
            g.astype(ef.dtype), w0.astype(ef.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(ef.dtype)
        dw = jax.lax.dot_general(
            ef, g.astype(ef.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w0.dtype)
        ds = jnp.zeros_like(scale)
        db = jnp.zeros_like(bias)
    return (d_ef, ds, db, dw, d_src, d_tr,
            jnp.zeros(rl.shape, jax.dtypes.float0), d_gb)


_op.defvjp(_op_fwd, _op_bwd)


def fused_g1_edge_update(ef, ef_ln, w0, src, tr, rl, gb):
    """``LN(ef) @ W0 + src + tr[rl] + gb`` in one kernel pass for a
    single-graph (G=1) canonical batch — rl globally ascending.

    ``ef_ln``: LayerNorm params dict or None (skips the LN).
    ``src [E, dout]``: precomputed sender term rows.
    ``tr [N, dout]``: receiver-side transformed node table.
    ``gb [dout]``: f32 graph-broadcast term + bias (zeros if absent).
    Falls back to the composed ops off-TPU or for unsupported shapes."""
    if ef_ln is None:
        de = ef.shape[1]
        scale = jnp.ones((de,), jnp.float32)
        bias = jnp.zeros((de,), jnp.float32)
        has_ln = False
    else:
        scale, bias, has_ln = ef_ln["scale"], ef_ln["bias"], True
    return _op(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
