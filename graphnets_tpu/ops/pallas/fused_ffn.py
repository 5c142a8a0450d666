"""Fused LayerNorm -> FeedForward -> residual Pallas TPU kernels (fwd+bwd).

The GNCore's second branch ``y = x + FF(LN(x))``
(``/root/reference/src/gncore.jl:56-59``) is HBM-bound when composed from
separate XLA ops: LN write, ``[T, 4d]`` hidden write+read, residual read —
~6x the optimal traffic for the edge feature set.  This kernel keeps the
``[tile, 4d]`` hidden activation in VMEM: HBM traffic is one read of ``x``
and one write of ``y`` (plus weights, resident in VMEM across the grid).

``extra`` folds the core's OTHER residual branch into the same pass:
``y = x + extra + FF(LN(x))`` — the ``graphnet_add`` with the GNBlock
branch otherwise costs one more full read+read+write sweep of ``[T, d]``.

Numerics match the pure-JAX path (``nn.core.LayerNorm`` + ``FeedForward``):
LN in f32 with the Flux ``(x - mu) / (std + eps)`` convention and safe-sqrt,
matmuls with f32 accumulation, intermediates rounded to the input dtype at
the same points the unfused path materializes them.

Backward is a second Pallas kernel (flash-style: only ``x`` and ``extra``'s
shape are saved; LN stats and the hidden activation are recomputed per row
tile in VMEM), accumulating the six parameter grads across the grid in
f32-resident blocks.  Falls back to ``jax.vjp`` of the pure reference for
unsupported shapes.  Dropout is not fused (the sort recipe trains with
dropout=0; the module falls back to the unfused path when dropout is
active).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_ffn_residual", "ln_ffn_residual_reference",
           "supports_fused_ffn"]

_EPS = 1e-5


def _ln_f32(xf, scale, bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    safe = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
    return (xf - mu) / (std + _EPS) * scale + bias


def _ln_stats(xf):
    """Returns (z, s, sigma_safe): pre-affine normalized rows, the forward
    divisor ``std + eps``, and std with var==0 rows mapped to 1 (their z is
    identically 0, so sigma-divided backward terms vanish — matching the
    reference's where-guarded autodiff)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    safe = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
    return (xf - mu) / (std + _EPS), std + _EPS, jnp.where(var > 0, std, 1.0)


def ln_ffn_residual_reference(x, scale, bias, w1, b1, w2, b2, extra=None):
    """Pure-JAX reference: x [+ extra] + Linear2(relu(Linear1(LN(x)))) with
    the same dtype rounding points as the unfused module path."""
    xn = _ln_f32(x.astype(jnp.float32), scale, bias).astype(x.dtype)
    h = jnp.maximum(xn @ w1.astype(x.dtype) + b1.astype(x.dtype), 0)
    y = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
    out = x + y
    if extra is not None:
        out = out + extra
    return out


# -- forward -----------------------------------------------------------------


def _fwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *maybe_extra):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    xn = _ln_f32(xf, s_ref[:], b_ref[:]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if maybe_extra:
        y = y + maybe_extra[0][:].astype(jnp.float32)
    o_ref[:] = (xf + y).astype(x.dtype)


def _fwd_kernel_extra(x_ref, e_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref):
    _fwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                e_ref)


def supports_fused_ffn(n_rows: int, d: int) -> bool:
    """Shapes the kernel handles: feature dim lane-aligned, rows tileable,
    and the resident weights + one minimal row tile within the VMEM budget
    (conservatively assuming f32)."""
    dh = 4 * d
    fits = 2 * d * dh * 4 + 8 * (d * 12 + dh * 8) <= _VMEM_BUDGET
    return d % 128 == 0 and n_rows % 8 == 0 and n_rows >= 8 and fits


_VMEM_BUDGET = 12 << 20  # leave headroom under the 16M scoped-vmem limit


def _pick_tile(n_rows: int, d: int, dh: int, itemsize: int,
               backward: bool = False) -> int:
    """Largest row tile whose working set fits VMEM.

    Working set ~= resident weights (2*d*dh*itemsize; backward adds the two
    f32 grad accumulators) + per-row intermediates: xf/y in f32 (8d bytes),
    xn in input dtype, h in f32 + input dtype (backward roughly doubles the
    per-row hidden traffic: dh_pre in f32 + bf16, dxn in f32).
    """
    weights = 2 * d * dh * itemsize + (2 * d * dh * 4 if backward else 0)
    per_row = d * (8 + itemsize) + dh * (4 + itemsize)
    if backward:
        per_row += d * (8 + itemsize) + dh * (4 + itemsize)
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n_rows % t == 0 and weights + t * per_row <= _VMEM_BUDGET:
            return t
    return 8


def _fused_forward(x, scale, bias, w1, b1, w2, b2, extra=None):
    from ...utils.config import get_config
    T, d = x.shape
    dh = w1.shape[1]
    tile = _pick_tile(T, d, dh, x.dtype.itemsize)
    grid = (T // tile,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    row_spec = pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM)
    in_specs = [row_spec] + ([row_spec] if extra is not None else []) + [
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, dh), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dh), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
    ]
    args = [x] + ([extra.astype(x.dtype)] if extra is not None else []) + [
        scale[None, :], bias[None, :], w1, b1[None, :], w2, b2[None, :]]
    # Donate the extra (block-branch) stream into the output: on v5e,
    # concurrent HBM read+write to DISTINCT buffers runs ~2x slower than
    # writing back into a just-read region (~325 vs ~650 GB/s measured,
    # benchmarks/RESULTS.md "HBM aliasing"), and an un-aliased custom-call
    # output inside lax.scan costs an extra carry copy.  `extra` is never
    # saved for backward (see _fwd), so the buffer is dead here.
    alias = {1: 0} if extra is not None else {}
    return pl.pallas_call(
        _fwd_kernel_extra if extra is not None else _fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, d), x.dtype),
        input_output_aliases=alias,
        cost_estimate=pl.CostEstimate(
            flops=4 * T * d * dh,
            bytes_accessed=(3 if extra is not None else 2) * T * d
            * x.dtype.itemsize + 2 * d * dh * w1.dtype.itemsize,
            transcendentals=T,
        ),
        interpret=get_config().pallas_interpret,
    )(*args)


# -- backward ----------------------------------------------------------------


def _bwd_kernel(x_ref, g_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]
    g = g_ref[:]
    gamma = s_ref[:]

    # Recompute forward intermediates (flash-style)
    z, s, sigma = _ln_stats(x.astype(jnp.float32))
    xn = (z * gamma + b_ref[:]).astype(x.dtype)
    hp = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    h = jnp.maximum(hp, 0).astype(x.dtype)

    gf = g.astype(jnp.float32)
    db2_ref[:] += jnp.sum(gf, axis=0, keepdims=True)
    # dW2 += h^T @ g
    dw2_ref[:] += jax.lax.dot_general(
        h, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dh = g @ W2^T, relu mask
    dh = jax.lax.dot_general(
        g, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dhp = jnp.where(hp > 0, dh, 0.0)
    db1_ref[:] += jnp.sum(dhp, axis=0, keepdims=True)
    dhp_c = dhp.astype(x.dtype)
    # dW1 += xn^T @ dhp
    dw1_ref[:] += jax.lax.dot_general(
        xn, dhp_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dxn = dhp @ W1^T
    dxn = jax.lax.dot_general(
        dhp_c, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds_ref[:] += jnp.sum(dxn * z, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)

    # std-convention LN pullback + residual passthrough (y = x + ...)
    dz = dxn * gamma
    mean_dz = jnp.mean(dz, axis=-1, keepdims=True)
    mean_dzz = jnp.mean(dz * z, axis=-1, keepdims=True)
    mean_z = jnp.mean(z, axis=-1, keepdims=True)
    dxf = (dz - mean_dz) / s - (z - mean_z) * (mean_dzz / sigma)
    dx_ref[:] = (dxf + gf).astype(dx_ref.dtype)


def _fused_backward(x, scale, bias, w1, b1, w2, g):
    from ...utils.config import get_config
    T, d = x.shape
    dh = w1.shape[1]
    tile = _pick_tile(T, d, dh, x.dtype.itemsize, backward=True)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(T // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, dh), jnp.float32),
            jax.ShapeDtypeStruct((1, dh), jnp.float32),
            jax.ShapeDtypeStruct((dh, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * T * d * dh,
            bytes_accessed=3 * T * d * x.dtype.itemsize + 4 * d * dh * 4,
            transcendentals=T,
        ),
        interpret=get_config().pallas_interpret,
        # The incoming cotangent is dead after this kernel; writing dx back
        # into its buffer avoids the slow distinct-buffer HBM r+w pattern
        # (dx and g share [T, d] / x.dtype by construction).
        input_output_aliases={1: 0},
    )(x, g.astype(x.dtype), scale[None, :], bias[None, :], w1, b1[None, :],
      w2)
    dx, ds, db, dw1, db1, dw2, db2 = outs
    return dx, ds[0], db[0], dw1, db1[0], dw2, db2[0]


# -- public op ---------------------------------------------------------------


def _run(x, scale, bias, w1, b1, w2, b2, extra):
    if extra is not None and extra.size == 0:  # sentinel for "no extra"
        extra = None
    if not supports_fused_ffn(x.shape[0], x.shape[1]):
        return ln_ffn_residual_reference(x, scale, bias, w1, b1, w2, b2,
                                         extra)
    return _fused_forward(x, scale, bias, w1, b1, w2, b2, extra)


@jax.custom_vjp
def _op(x, scale, bias, w1, b1, w2, b2, extra):
    return _run(x, scale, bias, w1, b1, w2, b2, extra)


def _fwd(x, scale, bias, w1, b1, w2, b2, extra):
    # `extra` itself is NOT a residual — only its dtype rides along in a
    # zero-size carrier ((0, 1) marks a real extra; a size-0 extra keeps
    # its OWN shape so the bwd cotangent matches the primal aval — a
    # genuinely zero-size extra like (0, d) passed straight to _op must
    # not collapse to (0, 0)).  Keeping it out of the residuals makes its
    # buffer dead after the forward kernel, so _fused_forward can donate
    # it into the output (input_output_aliases) without a defensive copy.
    e_carrier = (jnp.zeros((0, 1), extra.dtype) if extra.size
                 else jnp.zeros(extra.shape, extra.dtype))
    return _run(x, scale, bias, w1, b1, w2, b2, extra), \
        (x, scale, bias, w1, b1, w2, b2, e_carrier)


def _bwd(res, g):
    x, scale, bias, w1, b1, w2, b2, e_carrier = res
    # d extra = identity passthrough (it enters the sum directly); a
    # size-0 extra (incl. the (0, 0) no-extra sentinel) gets a zero
    # cotangent in its own shape.  The one ambiguous corner — a real extra
    # of shape (0, 1) — also takes the had_extra branch, where g has the
    # same (0, 1) shape, so the cotangent still matches.
    had_extra = e_carrier.shape == (0, 1)
    d_extra = (g.astype(e_carrier.dtype) if had_extra
               else jnp.zeros(e_carrier.shape, e_carrier.dtype))
    if not supports_fused_ffn(x.shape[0], x.shape[1]):
        _, vjp = jax.vjp(
            lambda *a: ln_ffn_residual_reference(*a),
            x, scale, bias, w1, b1, w2, b2)
        return vjp(g) + (d_extra,)
    dx, ds, db, dw1, db1, dw2, db2 = _fused_backward(
        x, scale, bias, w1, b1, w2, g)
    return (dx, ds.astype(scale.dtype), db.astype(bias.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), d_extra)


_op.defvjp(_fwd, _bwd)


def ln_ffn_residual(x, scale, bias, w1, b1, w2, b2, extra=None):
    """``x [+ extra] + FF(LN(x))`` fused on TPU (falls back to the reference
    implementation when shapes are unsupported).  ``extra``'s gradient is
    the identity passthrough."""
    if extra is None:
        # zero-size sentinel: one custom_vjp signature, no materialized
        # zeros array (the kernel variant without the extra input runs)
        extra = jnp.zeros((0, 0), x.dtype)
    return _op(x, scale, bias, w1, b1, w2, b2, extra)
