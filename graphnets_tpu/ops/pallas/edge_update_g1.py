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

__all__ = ["fused_g1_edge_update", "fused_g1_edge_update_agg",
           "supports_g1_edge_update"]

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
                            dout: int, itemsize: int = 2,
                            with_agg: bool = False,
                            part_itemsize: int | None = None) -> bool:
    """VMEM-budget gate.  ``itemsize`` is the edge-feature/out itemsize;
    ``part_itemsize`` the src/tr partials itemsize (they can differ: the
    gn_block passes bf16 ef with f32 partials below the bf16-gather-rows
    threshold).  Defaults to ``itemsize`` for callers whose buffers share
    one dtype."""
    if part_itemsize is None:
        part_itemsize = itemsize
    te, tn = _tiles(num_edges, num_nodes)
    if (te is None or de % 128 != 0 or dout % 128 != 0
            or num_nodes % 32 != 0 or num_nodes < 32):
        return False
    if with_agg and num_nodes % tn != 0:
        # The RMW loop writes whole TN chunks; a clamped final chunk would
        # overlap the previous one and double-count (the gather loop's
        # read-only clamp is harmless, the read-modify-write is not).
        return False
    vmem = (te * de * itemsize               # ef tile
            + te * dout * part_itemsize      # src tile
            + 2 * tn * dout * part_itemsize  # double-buffered tr chunks
            + te * dout * 4                  # f32 accumulator
            + te * dout * itemsize           # out tile
            + de * dout * itemsize           # W0
            + 2 * de * 4 + dout * 4)         # scale/bias/gb rows
    if with_agg:
        vmem += 2 * tn * dout * 4            # double-buffered agg RMW chunks
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
            *rest,                      # [agg_in,] out [, agg_out] + scratch
            TE: int, TN: int, D: int, N: int, has_ln: bool,
            with_agg: bool = False):
    if with_agg:
        (_agg_in, out_ref, agg_hbm, tab_buf, acc_ref, sems,
         agg_buf, rsems, wsems) = rest
    else:
        out_ref, tab_buf, acc_ref, sems = rest
        agg_hbm = agg_buf = rsems = wsems = None
    i = pl.program_id(0)
    start_al = starts_ref[i]
    end = ends_ref[i]

    # acc starts from the streamed sender term + the broadcast row.
    acc_ref[:] = src_ref[:].astype(jnp.float32) + gb_ref[:]

    nchunks = pl.cdiv(end - start_al, TN)
    idx_row = idx_ref[:]

    if with_agg:
        # Prefetch the first agg RMW chunks NOW so their read latency
        # hides under the gather loop + ef matmul (the previous tile
        # drained its writes, so reads at tile start are ordered).
        def _agg_rd(k, slot):
            off = pl.multiple_of(
                jnp.minimum(start_al + k * TN, N - TN), TN)
            return pltpu.make_async_copy(
                agg_hbm.at[pl.ds(off, TN), :],
                agg_buf.at[slot], rsems.at[slot])

        _agg_rd(0, 0).start()

        @pl.when(nchunks >= 2)
        def _():
            _agg_rd(1, 1).start()

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
    h = acc.astype(out_ref.dtype)
    out_ref[:] = h

    if with_agg:
        # Fused edge->node aggregation: RMW the [N, D] f32 agg buffer over
        # the SAME receiver windows (rl sorted -> contiguous, TN-aligned
        # chunks; N % TN == 0 so the clamp never engages and chunks are
        # disjoint).  Contributions use the ROUNDED h — identical numerics
        # to segment_sum(h_ef) on the kernel's output.  Sequential grid +
        # draining the write DMAs before tile end makes the cross-tile
        # boundary-chunk RMW race-free.
        idx_row2 = idx_ref[:]

        def agg_rd(k, slot):
            return pltpu.make_async_copy(
                agg_hbm.at[pl.ds(off_of(k), TN), :], agg_buf.at[slot],
                rsems.at[slot])

        def agg_wr(k, slot):
            return pltpu.make_async_copy(
                agg_buf.at[slot], agg_hbm.at[pl.ds(off_of(k), TN), :],
                wsems.at[slot])

        def agg_body(k, carry):
            slot = jax.lax.rem(k, 2)
            agg_rd(k, slot).wait()
            rows = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) \
                + off_of(k)
            onehot = jnp.where(rows == idx_row2, 1.0,
                               0.0).astype(h.dtype)        # [TN, TE]
            # f32 h must not round to bf16 through the MXU (same rule as
            # the gather loop above); bf16 rows pass through exactly.
            prec2 = (jax.lax.Precision.HIGHEST
                     if h.dtype == jnp.float32 else None)
            contrib = jax.lax.dot_general(
                onehot, h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=prec2,
                preferred_element_type=jnp.float32)
            agg_buf[slot] = agg_buf[slot] + contrib
            agg_wr(k, slot).start()

            @pl.when(k + 2 < nchunks)
            def _():
                # this chunk's write must land before its slot refills
                agg_wr(k, slot).wait()
                agg_rd(k + 2, slot).start()
            return carry

        jax.lax.fori_loop(0, nchunks, agg_body, 0)

        # Drain the last (up to two) un-waited writes: the next tile's
        # first chunk may be THIS tile's boundary chunk — its read must
        # observe the completed write.  Every started DMA is waited
        # exactly once (mid-loop waits cover writes 0..nchunks-3).
        @pl.when(nchunks >= 2)
        def _():
            k = nchunks - 2
            agg_wr(k, jax.lax.rem(k, 2)).wait()
        k = nchunks - 1
        agg_wr(k, jax.lax.rem(k, 2)).wait()


def _forward(ef, scale, bias, w0, src, tr, rl, gb, has_ln,
             with_agg=False):
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
    # Donate the sender-term stream into the output when dtypes line up
    # (arg index 5 counts the two scalar-prefetch operands): the [E, dout]
    # src buffer is dead after this kernel (never a residual — see
    # _op_fwd), and writing h_ef back into the just-read region runs ~2x
    # faster than a fresh-buffer write on v5e (RESULTS.md "HBM aliasing").
    alias = {5: 0} if src.dtype == ef.dtype else {}
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),              # tr table
        pl.BlockSpec((1, TE), lambda i, *_: (0, i)),    # rl tile
        pl.BlockSpec((TE, de), row),                    # ef
        pl.BlockSpec((TE, dout), row),                  # src
        pl.BlockSpec((1, de), full),                    # scale
        pl.BlockSpec((1, de), full),                    # bias
        pl.BlockSpec((de, dout), full),                 # W0
        pl.BlockSpec((1, dout), full),                  # gb
    ]
    args = [starts, ends, tr, rl.reshape(1, E), ef, src,
            scale[None, :].astype(jnp.float32),
            bias[None, :].astype(jnp.float32),
            w0.astype(ef.dtype), gb[None, :].astype(jnp.float32)]
    out_specs = pl.BlockSpec((TE, dout), row, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((E, dout), ef.dtype)
    scratch = [
        pltpu.VMEM((2, TN, dout), tr.dtype),
        pltpu.VMEM((TE, dout), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if with_agg:
        # The fused edge->node aggregation RMWs a zero-initialized f32
        # [N, dout] buffer: the zeros array is passed as an input and
        # aliased onto the agg output, so the kernel sees it initialized.
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # agg init
        args.append(jnp.zeros((N, dout), jnp.float32))
        alias = dict(alias)
        alias[10] = 1
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((N, dout), jnp.float32)]
        scratch += [
            pltpu.VMEM((2, TN, dout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    return pl.pallas_call(
        functools.partial(_kernel, TE=TE, TN=TN, D=dout, N=N,
                          has_ln=has_ln, with_agg=with_agg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * de * dout + 2 * E * TN * dout * (2 if with_agg
                                                           else 1),
            bytes_accessed=(E * (de + 2 * dout) + N * dout)
            * ef.dtype.itemsize + (8 * N * dout if with_agg else 0),
            transcendentals=E,
        ),
        interpret=_interpret(),
        input_output_aliases=alias,
    )(*args)


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
                                   tr.shape[1], ef.dtype.itemsize,
                                   part_itemsize=tr.dtype.itemsize):
        return _reference(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
    return _forward(ef, scale, bias, w0, src, tr, rl, gb, has_ln)


def _op_fwd(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    return (_op(ef, scale, bias, w0, src, tr, rl, gb, has_ln),
            (ef, scale, bias, w0, rl, tr.shape[0],
             jnp.zeros((0,), src.dtype), jnp.zeros((0,), tr.dtype),
             jnp.zeros((0,), gb.dtype)))


def _op_bwd(has_ln, res, g):
    return _bwd_core(has_ln, res, g)


def _bwd_core(has_ln, res, g):
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


def _reference2(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    """Composed reference for the agg-fused variant: the edge update
    followed by the sorted f32 segment sum of the ROUNDED h."""
    h = _reference(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
    agg = jax.ops.segment_sum(
        h.astype(jnp.float32), rl.astype(jnp.int32),
        num_segments=tr.shape[0], indices_are_sorted=True)
    return h, agg


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _op2(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    if not supports_g1_edge_update(ef.shape[0], tr.shape[0], ef.shape[1],
                                   tr.shape[1], ef.dtype.itemsize,
                                   with_agg=True,
                                   part_itemsize=tr.dtype.itemsize):
        return _reference2(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
    h, agg = _forward(ef, scale, bias, w0, src, tr, rl, gb, has_ln,
                      with_agg=True)
    return h, agg


def _op2_fwd(ef, scale, bias, w0, src, tr, rl, gb, has_ln):
    return (_op2(ef, scale, bias, w0, src, tr, rl, gb, has_ln),
            (ef, scale, bias, w0, rl, tr.shape[0],
             jnp.zeros((0,), src.dtype), jnp.zeros((0,), tr.dtype),
             jnp.zeros((0,), gb.dtype)))


def _op2_bwd(has_ln, res, grads):
    g_h, g_agg = grads
    rl = res[4]
    from .gather import sorted_gather
    # agg = segment_sum(h): its pullback is the sorted gather.  Combine
    # with g_h at the same rounding point the composed path uses (the
    # cotangent of a bf16 h is bf16 there).  g_agg flows back through the
    # caller's f32->dtype cast, so its values are already h-dtype
    # representable — gathering in that dtype halves the [E, dout] stream
    # with no extra rounding for the model path.
    # (Measured r5b negative result: folding the g_h add into the gather
    # kernel via sorted_gather_add LOSES ~4 ms/step single-device and
    # ~8 ms/step in the partitioned shards at E=1M/D=256 — the XLA add
    # fusion downstream of the plain gather is cheaper than widening the
    # kernel's accumulator stream.  Keep the composed form.)
    gh = (g_h.astype(jnp.float32)
          + sorted_gather(g_agg.astype(g_h.dtype), rl)
          .astype(jnp.float32)).astype(g_h.dtype)
    return _bwd_core(has_ln, res, gh)


_op2.defvjp(_op2_fwd, _op2_bwd)


def _unpack_ln(ef, ef_ln):
    if ef_ln is None:
        de = ef.shape[1]
        return (jnp.ones((de,), jnp.float32), jnp.zeros((de,), jnp.float32),
                False)
    return ef_ln["scale"], ef_ln["bias"], True


def fused_g1_edge_update_agg(ef, ef_ln, w0, src, tr, rl, gb):
    """Like :func:`fused_g1_edge_update`, but ALSO returns the sorted
    edge->node segment sum of the result (``agg[n] = sum of h_ef over
    edges with rl == n``, f32 ``[N, dout]``) computed in the same kernel
    pass — the separate segment-sum re-read of the [E, dout] output
    disappears.  Numerics match ``segment_sum(h_ef)`` on the rounded
    output exactly (f32 accumulation, pad-safe sorted contract).

    Gradient note: the backward rounds the AGG cotangent to ``ef.dtype``
    before gathering it back to edges.  This is exact for the gn_block
    path (which casts the f32 agg through ``ef.dtype`` anyway), but a
    consumer differentiating through the raw f32 agg output directly sees
    its cotangent at edge precision, not f32."""
    scale, bias, has_ln = _unpack_ln(ef, ef_ln)
    return _op2(ef, scale, bias, w0, src, tr, rl, gb, has_ln)


def fused_g1_edge_update(ef, ef_ln, w0, src, tr, rl, gb):
    """``LN(ef) @ W0 + src + tr[rl] + gb`` in one kernel pass for a
    single-graph (G=1) canonical batch — rl globally ascending.

    ``ef_ln``: LayerNorm params dict or None (skips the LN).
    ``src [E, dout]``: precomputed sender term rows.
    ``tr [N, dout]``: receiver-side transformed node table.
    ``gb [dout]``: f32 graph-broadcast term + bias (zeros if absent).
    Falls back to the composed ops off-TPU or for unsupported shapes."""
    scale, bias, has_ln = _unpack_ln(ef, ef_ln)
    return _op(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
