"""Fused SDDMM-shaped edge update for uniform slot layouts.

The split-linear edge update (``models/gn_block.py``) is

    h_ef = LN(ef) @ W0 + (nf@W1)[senders] + (nf@W2)[receivers]
           + (gf@W3)[edge_graph] + b

Composed from XLA ops, the three gathers cost ~2 full ``[E, D']`` HBM
sweeps (random row reads + an f32 partial-sum materialization).  When the
batch has a UNIFORM slot layout — graph ``b`` owns nodes
``[b*n_slots, (b+1)*n_slots)`` and edges ``[b*e_slots, (b+1)*e_slots)``
(``GraphsTuple.slot_shape``) — every edge tile's gather sources live in a
small aligned node window, so the gathers become one-hot matmuls on the
MXU against VMEM-resident windows and the whole update is ONE pass: read
``ef``, write ``h_ef``.

Accuracy: the transformed node/global partials arrive in f32 and are
split hi/lo into two bf16 planes (``x == hi + lo`` to ~16 mantissa bits);
each gather is two one-hot matmuls accumulated in f32, so the only
rounding below f32 is the single final cast — the same contract as the
concat formulation (``_linear_split``).

Backward composes from existing argsort-free kernels: LN->matmul backward
(``ln_linear``), the windowed one-hot scatter for senders
(``segment_sum.windowed_segment_sum``), the sorted one-hot scatter for
receivers, and a reshape-sum for the per-graph term (affine layout).

Reference semantics: ``/root/reference/src/edgefninput.jl`` +
``/root/reference/src/gnblock.jl:56`` (input assembly + Dense pair).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_edge_update", "fused_edge_update_agg",
           "fused_edge_update_reference", "supports_fused_edge_update"]

_VMEM_BUDGET = 12 << 20


def _interpret() -> bool:
    from ...utils.config import get_config
    return get_config().pallas_interpret


def _hi_lo(x_f32):
    hi = x_f32.astype(jnp.bfloat16)
    lo = (x_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def fused_edge_update_reference(ef, ln_params, w0, ts, tr, tg, b,
                                senders, receivers, e_slots):
    """Pure-JAX reference (f32 partial accumulation, one final rounding)."""
    from .ln_linear import ln_matmul_reference
    E = ef.shape[0]
    G = tg.shape[0]
    edge_graph = jnp.repeat(jnp.arange(G, dtype=jnp.int32), e_slots)[:E]
    acc = jnp.take(ts, senders, axis=0) + jnp.take(tr, receivers, axis=0) \
        + jnp.take(tg, edge_graph, axis=0)
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    if ln_params is not None:
        return ln_matmul_reference(ef, ln_params["scale"],
                                   ln_params["bias"], w0, addend=acc)
    part = jax.lax.dot_general(
        ef, w0.astype(ef.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (part + acc).astype(ef.dtype)


def _pick_k(G: int, n_slots: int, e_slots: int) -> Optional[int]:
    """Edge-tile width TE = k * e_slots; node window NW = k * n_slots."""
    best = None
    for k in range(1, G + 1):
        if G % k:
            continue
        te, nw = k * e_slots, k * n_slots
        if te % 128 or nw % 8 or nw > 2048 or te > 8192:
            continue
        if te >= 512:
            return k
        best = k  # keep growing until te >= 512 or divisors run out
    return best


def supports_fused_edge_update(E, N, G, de, dout, n_slots, e_slots,
                               dtype, with_agg: bool = False) -> bool:
    if dtype != jnp.bfloat16:
        return False
    if G < 2 or N != G * n_slots or E != G * e_slots:
        return False
    if de < 128 or dout < 128 or de % 128 or dout % 128:
        return False
    k = _pick_k(G, n_slots, e_slots)
    if k is None:
        return False
    te, nw = k * e_slots, k * n_slots
    vmem = (te * (de + dout) * 2 + de * dout * 2 + 4 * nw * dout * 2
            + te * dout * 4 + te * de * 4 + 2 * nw * te * 2)
    if with_agg:
        vmem += 2 * nw * dout * 4       # double-buffered f32 agg out tile
    return vmem <= _VMEM_BUDGET


def _ln_f32(xf, scale, bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    safe = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
    return (xf - mu) / (std + 1e-5) * scale + bias


def _kernel(ef_ref, s_ref, r_ref, sc_ref, bl_ref, w_ref,
            tsh_ref, tsl_ref, trh_ref, trl_ref, tgh_ref, tgl_ref, b_ref,
            o_ref, *maybe_agg, TE, NW, K, e_slots, use_ln, with_agg=False):
    i = pl.program_id(0)
    x = ef_ref[:]
    if use_ln:
        xn = _ln_f32(x.astype(jnp.float32), sc_ref[:], bl_ref[:]).astype(
            x.dtype)
    else:
        xn = x
    acc = jax.lax.dot_general(
        xn, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TE, D']

    base = i * NW

    def onehot_of(idx_row):
        # one-hot transposed [NW, TE]: row n matches edges whose index is
        # window-local n; contract over NW -> [TE, D'] gather on the MXU.
        rows = jax.lax.broadcasted_iota(jnp.int32, (NW, 1), 0) + base
        return jnp.where(rows == idx_row, 1.0, 0.0).astype(jnp.bfloat16)

    def gather(onehot_t, hi_ref, lo_ref):
        out = jax.lax.dot_general(
            onehot_t, hi_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(
            onehot_t, lo_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out

    acc += gather(onehot_of(s_ref[:]), tsh_ref, tsl_ref)
    onehot_r = onehot_of(r_ref[:])
    acc += gather(onehot_r, trh_ref, trl_ref)

    # per-graph term: edge e of this tile belongs to GLOBAL graph
    # i*K + e//e_slots; tg is loaded whole (it is tiny), so the one-hot
    # compares against global graph ids.
    eg_row = (jax.lax.broadcasted_iota(jnp.int32, (1, TE), 1) // e_slots
              + i * K)
    kg = jax.lax.broadcasted_iota(jnp.int32, (tgh_ref.shape[0], 1), 0)
    onehot_g = jnp.where(kg == eg_row, 1.0, 0.0).astype(jnp.bfloat16)
    acc += jax.lax.dot_general(
        onehot_g, tgh_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        onehot_g, tgl_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    acc += b_ref[:]
    h = acc.astype(o_ref.dtype)
    o_ref[:] = h
    if with_agg:
        # Fused edge->node aggregation: a node's incoming edges live in its
        # own graph's edge slots, i.e. entirely inside THIS tile, so the
        # tile's agg block is complete and disjoint — reuse the receiver
        # one-hot transposed: agg[NW, D'] = onehot_r @ h (f32 accumulate of
        # the ROUNDED h, identical numerics to segment_sum on the output;
        # padded edges target padding node rows by the layout contract).
        (agg_ref,) = maybe_agg
        agg_ref[:] = jax.lax.dot_general(
            onehot_r, h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _forward(ef, scale, bias, w0, ts, tr, tg, b, senders, receivers,
             n_slots, e_slots, use_ln, with_agg=False):
    E, de = ef.shape
    dout = w0.shape[1]
    N = ts.shape[0]
    G = tg.shape[0]
    k = _pick_k(G, n_slots, e_slots)
    TE, NW = k * e_slots, k * n_slots
    grid = E // TE
    tsh, tsl = _hi_lo(ts)
    trh, trl = _hi_lo(tr)
    tgh, tgl = _hi_lo(tg)
    row_e = lambda i: (i, 0)
    full = lambda i: (0, 0)
    idx = lambda i: (0, i)
    out_specs = pl.BlockSpec((TE, dout), row_e, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((E, dout), ef.dtype)
    if with_agg:
        out_specs = [out_specs,
                     pl.BlockSpec((NW, dout), row_e,
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((N, dout), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_kernel, TE=TE, NW=NW, K=k, e_slots=e_slots,
                          use_ln=use_ln, with_agg=with_agg),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TE, de), row_e, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TE), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TE), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, de), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, de), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((de, dout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, dout), row_e, memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, dout), row_e, memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, dout), row_e, memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, dout), row_e, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, dout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, dout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), full, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * de * dout + (10 if with_agg else 8) * E * NW
            * dout,
            bytes_accessed=E * (de + dout) * 2 + 4 * N * dout * 2
            + de * dout * 2 + (4 * N * dout if with_agg else 0),
            transcendentals=E if use_ln else 0,
        ),
        interpret=_interpret(),
    )(ef, senders.reshape(1, E).astype(jnp.int32),
      receivers.reshape(1, E).astype(jnp.int32),
      scale[None, :].astype(jnp.float32), bias[None, :].astype(jnp.float32),
      w0.astype(ef.dtype), tsh, tsl, trh, trl, tgh, tgl,
      b[None, :].astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _make_op(n_slots: int, e_slots: int, use_ln: bool,
             with_agg: bool = False):

    @jax.custom_vjp
    def op(ef, scale, bias, w0, ts, tr, tg, b, senders, receivers):
        return _forward(ef, scale, bias, w0, ts, tr, tg, b,
                        senders, receivers, n_slots, e_slots, use_ln,
                        with_agg)

    def fwd(ef, scale, bias, w0, ts, tr, tg, b, senders, receivers):
        out = op(ef, scale, bias, w0, ts, tr, tg, b, senders, receivers)
        return out, (ef, scale, bias, w0, tg.shape[0], senders, receivers)

    def bwd(res, g):
        ef, scale, bias, w0, G, senders, receivers = res
        if with_agg:
            # agg = segment_sum(h): pullback is the sorted gather; combine
            # at the composed path's rounding point (bf16 cotangents —
            # g_agg flows back through the caller's f32->dtype cast, so
            # gathering in h's dtype adds no rounding for the model path
            # and halves the stream).
            g, g_agg = g
            from .gather import sorted_gather
            g = (g.astype(jnp.float32)
                 + sorted_gather(g_agg.astype(g.dtype),
                                 receivers.astype(jnp.int32))
                 .astype(jnp.float32)).astype(g.dtype)
        E, de = ef.shape
        N = n_slots * G
        if use_ln:
            from .ln_linear import _backward as ln_backward
            d_ef, ds, db_ln, dw0 = ln_backward(ef, scale, bias, w0, g)
        else:
            gc = g.astype(ef.dtype)
            d_ef = jax.lax.dot_general(
                gc, w0.astype(ef.dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(ef.dtype)
            dw0 = jax.lax.dot_general(
                ef, gc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = jnp.zeros_like(scale)
            db_ln = jnp.zeros_like(bias)
        # argsort-free scatters (see module docstring)
        from .segment_sum import sorted_segment_sum, windowed_segment_sum
        gi = jnp.arange(G + 1, dtype=jnp.int32)
        d_ts = windowed_segment_sum(g, senders, N, gi * n_slots,
                                    gi * e_slots).astype(jnp.float32)
        d_tr = sorted_segment_sum(g, receivers, N).astype(jnp.float32)
        gf32 = g.astype(jnp.float32)
        d_tg = jnp.sum(gf32.reshape(G, e_slots, -1), axis=1)
        d_b = jnp.sum(gf32, axis=0)
        return (d_ef, ds.astype(scale.dtype), db_ln.astype(bias.dtype),
                dw0.astype(w0.dtype), d_ts, d_tr, d_tg, d_b, None, None)

    op.defvjp(fwd, bwd)
    return op


def fused_edge_update(ef, ln_params, w0, ts, tr, tg, b, senders, receivers,
                      n_slots: int, e_slots: int):
    """One-pass edge update for uniform slot layouts (see module doc).

    ``ts``/``tr``/``tg``: f32 transformed node/global partials
    (``nf @ W1``, ``nf @ W2``, ``gf @ W3``).  ``ln_params`` optional
    ``{"scale", "bias"}`` to LayerNorm ``ef`` before its matmul.
    Returns ``[E, D']`` in ``ef.dtype``.
    """
    use_ln = ln_params is not None
    scale = ln_params["scale"] if use_ln else jnp.ones((ef.shape[1],),
                                                       jnp.float32)
    bias = ln_params["bias"] if use_ln else jnp.zeros((ef.shape[1],),
                                                      jnp.float32)
    if b is None:
        b = jnp.zeros((ts.shape[1],), jnp.float32)
    return _make_op(n_slots, e_slots, use_ln)(
        ef, scale, bias, w0, ts, tr, tg, b, senders, receivers)


def fused_edge_update_agg(ef, ln_params, w0, ts, tr, tg, b, senders,
                          receivers, n_slots: int, e_slots: int):
    """Like :func:`fused_edge_update`, but ALSO returns the edge->node
    segment sum of the result as f32 ``[N, D']`` computed in the same
    kernel pass (a node's incoming edges live entirely in its own tile,
    so each tile writes a complete disjoint agg block — the separate
    [E, D'] re-read disappears).  Numerics == ``segment_sum`` over the
    rounded output under the uniform layout's pad-safe contract.  Callers
    gate with ``supports_fused_edge_update(..., with_agg=True)``.

    REQUIRES globally ascending ``receivers``: the forward's tile-local
    one-hot aggregation would tolerate any tile-local receivers, but the
    BACKWARD pulls the agg cotangent back with ``sorted_gather`` (ascending
    contract — out-of-range/unsorted ids silently zero or double-count), so
    unsorted receivers get a correct forward and corrupted gradients.
    ``GRAPHNETS_TPU_DEBUG=1`` checks the contract here.

    Gradient note: the backward rounds the AGG cotangent to the edge dtype
    before the gather (exact for the gn_block path, which casts the f32
    agg through the edge dtype; a consumer differentiating the raw f32 agg
    directly sees its cotangent at edge precision)."""
    from ...utils.config import debug_checks
    if debug_checks():
        from .gather import _debug_check_sorted_in_range
        _debug_check_sorted_in_range(receivers, ts.shape[0])
    use_ln = ln_params is not None
    scale = ln_params["scale"] if use_ln else jnp.ones((ef.shape[1],),
                                                       jnp.float32)
    bias = ln_params["bias"] if use_ln else jnp.zeros((ef.shape[1],),
                                                      jnp.float32)
    if b is None:
        b = jnp.zeros((ts.shape[1],), jnp.float32)
    return _make_op(n_slots, e_slots, use_ln, with_agg=True)(
        ef, scale, bias, w0, ts, tr, tg, b, senders, receivers)
