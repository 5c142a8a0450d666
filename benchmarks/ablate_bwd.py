#!/usr/bin/env python
"""Ablation: backward-pass pieces on the headline workload (E=16384, D=384).

What does each gradient component cost on the TPU?  Carries keep every
piece data-dependent so nothing is hoisted out of the scan.
"""

import sys, time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)

E, N, D = 16384, 1024, 384
DTYPE = jnp.bfloat16

rng = np.random.default_rng(0)
senders = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
receivers = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
ef0 = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), DTYPE)
nf0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DTYPE)
W1 = jnp.asarray(rng.normal(size=(D, 4 * D)).astype(np.float32) * .02, DTYPE)
W2 = jnp.asarray(rng.normal(size=(4 * D, D)).astype(np.float32) * .02, DTYPE)
scale = jnp.ones((D,), jnp.float32)
bias = jnp.zeros((D,), jnp.float32)


def ln(x):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    safe = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
    return ((xf - mu) / (std + 1e-5) * scale + bias).astype(x.dtype)


def ff(x, w1, w2):
    return x + jnp.maximum(ln(x) @ w1, 0) @ w2


def grad_ff_x(e, n):
    # fwd + bwd wrt x with a carry-dependent cotangent (a constant
    # cotangent lets XLA constant-fold most of the backward).
    y, vjp = jax.vjp(lambda x: ff(x, W1, W2), e)
    (gx,) = vjp(e)
    return gx.astype(DTYPE) + y * 1e-6, n


def grad_ff_xw_simple(e, n):
    y, vjp = jax.vjp(ff, e, W1, W2)
    gx, gw1, gw2 = vjp(e)
    fold = (jnp.sum(gw1.astype(jnp.float32))
            + jnp.sum(gw2.astype(jnp.float32))) * 1e-12
    return gx.astype(DTYPE) + y * 1e-6, n * (1 + fold).astype(DTYPE)


def grad_ff_fused_xw(e, n):
    from graphnets_tpu.ops.pallas.fused_ffn import ln_ffn_residual
    b1 = jnp.zeros((4 * D,), DTYPE)
    b2 = jnp.zeros((D,), DTYPE)

    def f(x, w1, w2):
        return ln_ffn_residual(x, scale, bias, w1, b1, w2, b2)

    y, vjp = jax.vjp(f, e, W1, W2)
    gx, gw1, gw2 = vjp(e)
    fold = (jnp.sum(gw1.astype(jnp.float32))
            + jnp.sum(gw2.astype(jnp.float32))) * 1e-12
    return gx.astype(DTYPE) + y * 1e-6, n * (1 + fold).astype(DTYPE)


def argsort_e(e, n):
    # cost of the per-step argsort the sorted-grad scatter path pays
    perm = jnp.argsort(senders + (e[0, 0] * 0).astype(jnp.int32))
    return e + jnp.take(e, perm, axis=0) * 1e-6, n


def scatter_sorted(e, n):
    # backward of take(t, receivers): cotangent e scattered by sorted ids.
    # e must CHANGE each iteration or the whole piece is hoisted as
    # loop-invariant.
    from graphnets_tpu.ops.pallas.segment_sum import sorted_segment_sum
    e2 = e + jnp.take(n, receivers, axis=0) * 1e-6
    return e2, sorted_segment_sum(e2, receivers, N) + n


def scatter_via_argsort(e, n):
    # backward of take(t, senders): argsort + gather + sorted reduce
    from graphnets_tpu.ops.pallas.segment_sum import sorted_segment_sum
    e2 = e + jnp.take(n, receivers, axis=0) * 1e-6
    perm = jnp.argsort(senders + (e2[0, 0] * 0).astype(jnp.int32))
    seg = jnp.take(senders, perm)
    gs = jnp.take(e2, perm, axis=0)
    return e2, sorted_segment_sum(gs, seg, N) + n


def scatter_xla(e, n):
    e2 = e + jnp.take(n, receivers, axis=0) * 1e-6
    return e2, jax.ops.segment_sum(
        e2.astype(jnp.float32), senders, num_segments=N).astype(DTYPE) + n


PIECES = {
    "ff_fwd_only": lambda e, n: (ff(e, W1, W2), n),
    "ff_grad_x": grad_ff_x,
    "ff_grad_xw": grad_ff_xw_simple,
    "ff_grad_fused_xw": grad_ff_fused_xw,
    "argsort_senders": argsort_e,
    "scatter_sorted_recv": scatter_sorted,
    "scatter_argsort_send": scatter_via_argsort,
    "scatter_xla_send": scatter_xla,
}


def timed(step):
    def make(length):
        @jax.jit
        def f(c):
            def body(c, _):
                e, n = step(*c)
                return (e.astype(DTYPE), n.astype(DTYPE)), None
            c2, _ = jax.lax.scan(body, c, None, length=length)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in c2)
        return f

    times = {}
    for length in (10, 100):
        f = make(length)
        float(f((ef0, nf0)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f((ef0, nf0)))
            best = min(best, time.perf_counter() - t0)
        times[length] = best
    return (times[100] - times[10]) / 90


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("pieces", nargs="*", default=None)
    args = ap.parse_args()
    for name in (args.pieces or list(PIECES)):
        t = timed(PIECES[name])
        print(f"{name:22s} {t*1e6:8.1f} us", flush=True)
