"""Fused LayerNorm -> FeedForward -> residual Pallas TPU kernel.

The GNCore's second branch ``y = x + FF(LN(x))``
(``/root/reference/src/gncore.jl:56-59``) is HBM-bound when composed from
separate XLA ops: LN write, ``[T, 4d]`` hidden write+read, residual read —
~6x the optimal traffic for the edge feature set.  This kernel keeps the
``[tile, 4d]`` hidden activation in VMEM: HBM traffic is one read of ``x``
and one write of ``y`` (plus weights, resident in VMEM across the grid).

Numerics match the pure-JAX path (``nn.core.LayerNorm`` + ``FeedForward``):
LN in f32 with the Flux ``(x - mu) / (std + eps)`` convention and safe-sqrt,
matmuls with f32 accumulation, intermediates rounded to the input dtype at
the same points the unfused path materializes them.

Backward = recompute via ``jax.vjp`` of the pure reference (correctness
first; a fused backward kernel is a later optimization).  Dropout is not
fused (the sort recipe trains with dropout=0; the module falls back to the
unfused path when dropout is active).
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


def ln_ffn_residual_reference(x, scale, bias, w1, b1, w2, b2):
    """Pure-JAX reference: x + Linear2(relu(Linear1(LN(x)))) with the same
    dtype rounding points as the unfused module path."""
    xn = _ln_f32(x.astype(jnp.float32), scale, bias).astype(x.dtype)
    h = jnp.maximum(xn @ w1.astype(x.dtype) + b1.astype(x.dtype), 0)
    y = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
    return x + y


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    xn = _ln_f32(xf, s_ref[:], b_ref[:]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (xf + y).astype(x.dtype)


def supports_fused_ffn(n_rows: int, d: int) -> bool:
    """Shapes the kernel handles: feature dim lane-aligned, rows tileable,
    and the resident weights + one minimal row tile within the VMEM budget
    (conservatively assuming f32)."""
    dh = 4 * d
    fits = 2 * d * dh * 4 + 8 * (d * 12 + dh * 8) <= _VMEM_BUDGET
    return d % 128 == 0 and n_rows % 8 == 0 and n_rows >= 8 and fits


_VMEM_BUDGET = 12 << 20  # leave headroom under the 16M scoped-vmem limit


def _pick_tile(n_rows: int, d: int, dh: int, itemsize: int) -> int:
    """Largest row tile whose working set fits VMEM.

    Working set ~= resident weights (2*d*dh*itemsize) + per-row
    intermediates: xf/y in f32 (8d bytes), xn in input dtype, h in f32 +
    input dtype.  An f32 input at tile 1024 / d=384 overflows the 16M
    scoped-vmem stack (measured), so the tile is budgeted, not fixed.
    """
    weights = 2 * d * dh * itemsize
    per_row = d * (8 + itemsize) + dh * (4 + itemsize)
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n_rows % t == 0 and weights + t * per_row <= _VMEM_BUDGET:
            return t
    return 8


def _fused_forward(x, scale, bias, w1, b1, w2, b2):
    from ...utils.config import get_config
    T, d = x.shape
    dh = w1.shape[1]
    tile = _pick_tile(T, d, dh, x.dtype.itemsize)
    grid = (T // tile,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * d * dh,
            bytes_accessed=2 * T * d * x.dtype.itemsize
            + 2 * d * dh * w1.dtype.itemsize,
            transcendentals=T,
        ),
        interpret=get_config().pallas_interpret,
    )(x, scale[None, :], bias[None, :], w1, b1[None, :], w2, b2[None, :])


@jax.custom_vjp
def ln_ffn_residual(x, scale, bias, w1, b1, w2, b2):
    """``x + FF(LN(x))`` fused on TPU (falls back to the reference
    implementation when shapes are unsupported)."""
    if not supports_fused_ffn(x.shape[0], x.shape[1]):
        return ln_ffn_residual_reference(x, scale, bias, w1, b1, w2, b2)
    return _fused_forward(x, scale, bias, w1, b1, w2, b2)


def _fwd(x, scale, bias, w1, b1, w2, b2):
    return ln_ffn_residual(x, scale, bias, w1, b1, w2, b2), \
        (x, scale, bias, w1, b1, w2, b2)


def _bwd(res, g):
    _, vjp = jax.vjp(ln_ffn_residual_reference, *res)
    return vjp(g)


ln_ffn_residual.defvjp(_fwd, _bwd)
