"""Fused LayerNorm -> Linear Pallas TPU kernel, forward and backward.

In the GNCore, the pre-block GraphNorm's edge output feeds exactly one
consumer: the edge-update matmul's ``ef @ W0`` term (split-linear path,
``models/gn_block.py``).  Composed from separate XLA ops that costs a full
``[E, D]`` HBM round trip (LN write + matmul read) — ~3.3 ms at the 1M-edge
scale, ~40 us per core on the headline workload.  This kernel normalizes
each row tile in VMEM and feeds it straight to the MXU.

Numerics match ``nn.core.LayerNorm`` (Flux ``(x - mu) / (std + eps)``
convention, f32 stats, safe-sqrt var==0 guard) followed by
``x_n.astype(x.dtype) @ w.astype(x.dtype)`` with f32 accumulation — the
same rounding points as the unfused pair.  No bias: the split-linear path
adds the update net's bias once at the end of the partial-sum reduction.

Backward is a second Pallas kernel: recomputes the LN statistics per tile
(flash-style — nothing but ``x`` is saved from the forward), accumulates
``dW`` / ``dscale`` / ``dbias`` across the grid in VMEM-resident f32
blocks, and emits ``dx`` via the explicit std-convention LayerNorm
pullback.  Gradient-parity with ``jax.grad`` of the reference composition
is asserted in ``tests/test_pallas_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_matmul", "ln_matmul_reference", "supports_ln_matmul"]

_EPS = 1e-5
_VMEM_BUDGET = 12 << 20


def _interpret() -> bool:
    from ...utils.config import get_config
    return get_config().pallas_interpret


def _ln_stats(xf):
    """f32 row stats with the reference's safe-sqrt convention.  Returns
    (z, s, sigma_safe): z the pre-affine normalized rows, s = std + eps
    (the forward divisor), sigma_safe = std with var==0 rows mapped to 1
    (their z is identically 0, so backward terms divided by sigma vanish).
    """
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    safe = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
    s = std + _EPS
    sigma_safe = jnp.where(var > 0, std, 1.0)
    return (xf - mu) / s, s, sigma_safe


def ln_matmul_reference(x, scale, bias, w, addend=None):
    """Pure-JAX reference: ``LayerNorm(x) @ w [+ addend]`` with module
    rounding points (LN output cast to x.dtype before the matmul).

    Without ``addend``, returns the f32 PARTIAL product (the split-linear
    reduction accumulates partials in f32 so the split path is never less
    accurate than the concat formulation).  With ``addend`` (the f32 sum of
    the OTHER split partials + bias), returns the completed row in
    ``x.dtype`` — a single final rounding, exactly like the concat
    formulation, without materializing the f32 partial in HBM
    (models/gn_block.py ``_linear_split``)."""
    z, _, _ = _ln_stats(x.astype(jnp.float32))
    xn = (z * scale + bias).astype(x.dtype)
    out = jax.lax.dot_general(
        xn, w.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if addend is None:
        return out
    return (out + addend.astype(jnp.float32)).astype(x.dtype)


def supports_ln_matmul(n_rows: int, d: int, dout: int) -> bool:
    fits = (d * dout * 6          # w (<=f32) + dw f32
            + 256 * (d * 14 + dout * 6)) <= _VMEM_BUDGET
    return (d % 128 == 0 and dout % 128 == 0 and n_rows % 8 == 0
            and n_rows >= 8 and fits)


def _pick_tile(n_rows: int, d: int, dout: int, itemsize: int) -> int:
    weights = d * dout * (itemsize + 4)
    per_row = d * (12 + itemsize) + dout * (4 + itemsize)
    for t in (512, 256, 128, 64, 32, 16, 8):
        if n_rows % t == 0 and weights + t * per_row <= _VMEM_BUDGET:
            return t
    return 8


# -- forward -----------------------------------------------------------------


def _fwd_kernel(x_ref, s_ref, b_ref, w_ref, o_ref, *maybe_addend):
    x = x_ref[:]
    z, _, _ = _ln_stats(x.astype(jnp.float32))
    xn = (z * s_ref[:] + b_ref[:]).astype(x.dtype)
    out = jax.lax.dot_general(
        xn, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if maybe_addend:
        out = out + maybe_addend[0][:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _fwd_kernel_addend(x_ref, a_ref, s_ref, b_ref, w_ref, o_ref):
    _fwd_kernel(x_ref, s_ref, b_ref, w_ref, o_ref, a_ref)


def _forward(x, scale, bias, w, addend=None):
    T, d = x.shape
    dout = w.shape[1]
    tile = _pick_tile(T, d, dout, x.dtype.itemsize)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    row_out = pl.BlockSpec((tile, dout), row, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM)] + (
        [row_out] if addend is not None else []) + [
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, dout), full, memory_space=pltpu.VMEM),
    ]
    # The addend streams in its STORED dtype (the kernel upcasts
    # in-register) — a host-side astype(f32) would materialize a full
    # extra [T, dout] f32 copy in HBM.
    args = [x] + ([addend] if addend is not None else []) + [
        scale[None, :].astype(jnp.float32),
        bias[None, :].astype(jnp.float32), w.astype(x.dtype)]
    out_dtype = x.dtype if addend is not None else jnp.float32
    # Donate the addend stream into the output when dtypes match: it is
    # dead after this kernel (only a zero-size carrier rides in the
    # residuals — see _fwd) and in-place HBM writes are ~2x faster on v5e
    # than fresh-buffer writes (RESULTS.md "HBM aliasing").
    alias = ({1: 0} if addend is not None
             and addend.dtype == jnp.dtype(out_dtype) else {})
    return pl.pallas_call(
        _fwd_kernel_addend if addend is not None else _fwd_kernel,
        grid=(T // tile,),
        in_specs=in_specs,
        out_specs=row_out,
        out_shape=jax.ShapeDtypeStruct((T, dout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * d * dout,
            bytes_accessed=T * (d + dout) * x.dtype.itemsize
            + (T * dout * addend.dtype.itemsize if addend is not None
               else 0)
            + d * dout * w.dtype.itemsize,
            transcendentals=T,
        ),
        interpret=_interpret(),
        input_output_aliases=alias,
    )(*args)


# -- backward ----------------------------------------------------------------


def _bwd_kernel(x_ref, g_ref, s_ref, b_ref, w_ref,
                dx_ref, dw_ref, ds_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:]
    g = g_ref[:]
    z, s, sigma = _ln_stats(x.astype(jnp.float32))
    gamma = s_ref[:]
    xn = (z * gamma + b_ref[:]).astype(x.dtype)

    # dW += xn^T @ g   (contract rows)
    dw_ref[:] += jax.lax.dot_general(
        xn, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dxn = g @ w^T    (contract dout)
    dxn = jax.lax.dot_general(
        g, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds_ref[:] += jnp.sum(dxn * z, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)

    # std-convention LN pullback (var==0 rows: z == 0, sigma forced to 1,
    # so the z-term vanishes and dx = (dz - mean dz) / eps — matching the
    # reference's where-guarded autodiff exactly).
    dz = dxn * gamma
    mean_dz = jnp.mean(dz, axis=-1, keepdims=True)
    mean_dzz = jnp.mean(dz * z, axis=-1, keepdims=True)
    mean_z = jnp.mean(z, axis=-1, keepdims=True)
    dxf = (dz - mean_dz) / s - (z - mean_z) * (mean_dzz / sigma)
    dx_ref[:] = dxf.astype(dx_ref.dtype)


def _backward(x, scale, bias, w, g):
    T, d = x.shape
    dout = w.shape[1]
    tile = _pick_tile(T, d, dout, x.dtype.itemsize)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    # Donate the (dead) incoming cotangent into dx when shapes line up —
    # in-place HBM r+w is ~2x faster than fresh-buffer writes on v5e
    # (RESULTS.md "HBM aliasing").  g is cast to x.dtype below, so dtypes
    # always match; shapes match iff the matmul is square.
    alias = {1: 0} if d == dout else {}
    dx, dw, ds, db = pl.pallas_call(
        _bwd_kernel,
        grid=(T // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dout), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dout), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, d), x.dtype),
            jax.ShapeDtypeStruct((d, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * d * dout,
            bytes_accessed=T * (2 * d + dout) * x.dtype.itemsize
            + 2 * d * dout * 4,
            transcendentals=T,
        ),
        interpret=_interpret(),
        input_output_aliases=alias,
    )(x, g.astype(x.dtype), scale[None, :].astype(jnp.float32),
      bias[None, :].astype(jnp.float32), w.astype(x.dtype))
    return dx, ds[0], db[0], dw


def _run(x, scale, bias, w, addend):
    if addend is not None and addend.size == 0:  # sentinel for "no addend"
        addend = None
    if not supports_ln_matmul(x.shape[0], x.shape[1], w.shape[1]):
        return ln_matmul_reference(x, scale, bias, w, addend)
    return _forward(x, scale, bias, w, addend)


@jax.custom_vjp
def _op(x, scale, bias, w, addend):
    return _run(x, scale, bias, w, addend)


def _fwd(x, scale, bias, w, addend):
    # Only a zero-size dtype carrier of the addend rides in the residuals
    # ((0, 1) marks a real addend; a size-0 addend keeps its OWN shape so
    # the bwd cotangent matches the primal aval — a genuinely zero-size
    # addend like (0, d) passed straight to _op must not collapse to
    # (0, 0)): keeping the [T, dout] addend itself out makes its buffer
    # dead after the forward kernel, so _forward can donate it into the
    # output.
    a_carrier = (jnp.zeros((0, 1), addend.dtype) if addend.size
                 else jnp.zeros(addend.shape, addend.dtype))
    return _run(x, scale, bias, w, addend), (x, scale, bias, w, a_carrier)


def _bwd(res, g):
    x, scale, bias, w, a_carrier = res
    # d addend = identity (it enters the sum directly; for the completed-
    # row variant the upstream cotangent g is in x.dtype — upcast).  A
    # real (0, 1)-shaped addend also takes the first branch, where g has
    # the same shape, so the cotangent still matches.
    d_addend = (g.astype(a_carrier.dtype) if a_carrier.shape == (0, 1)
                else jnp.zeros(a_carrier.shape, a_carrier.dtype))
    if not supports_ln_matmul(x.shape[0], x.shape[1], w.shape[1]):
        _, vjp = jax.vjp(
            lambda x_, s_, b_, w_: ln_matmul_reference(x_, s_, b_, w_),
            x, scale, bias, w)
        # The no-addend reference emits f32; its vjp wants an f32 cotangent
        # regardless of which variant produced g.
        return vjp(g.astype(jnp.float32)) + (d_addend,)
    dx, ds, db, dw = _backward(x, scale, bias, w, g)
    return (dx, ds.astype(scale.dtype), db.astype(bias.dtype),
            dw.astype(w.dtype), d_addend)


_op.defvjp(_fwd, _bwd)


def ln_matmul(x, scale, bias, w, addend=None):
    """``LayerNorm(x; scale, bias) @ w [+ addend]`` fused on TPU; falls
    back to the pure composition for unsupported shapes.

    Without ``addend`` the result is the f32 partial product; with
    ``addend`` (f32, ``[T, dout]``) the result is the completed row in
    ``x.dtype`` with a single final rounding.  ``addend``'s gradient is the
    identity passthrough."""
    if addend is None:
        addend = jnp.zeros((0, 0), jnp.float32)
    return _op(x, scale, bias, w, addend)
