#!/usr/bin/env python
"""Ablation: where does the 1M-edge GNCore-stack forward time go?

Each piece carries BOTH ef and nf through the scan so nf-dependent work
cannot be hoisted as loop-invariant (the ablate_core.py pitfall).
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

N, DEG, D = 65536, 16, 256
E = N * DEG
DTYPE = jnp.bfloat16
L1, L2 = 2, 12

rng = np.random.default_rng(0)
senders = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
receivers = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
ef0 = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), DTYPE)
nf0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DTYPE)

W0 = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * .02, DTYPE)
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


def seg_pallas(c):
    from graphnets_tpu.ops.pallas.segment_sum import sorted_segment_sum
    return sorted_segment_sum(c, receivers, N)


def ff_fused(x):
    from graphnets_tpu.ops.pallas.fused_ffn import ln_ffn_residual
    b1 = jnp.zeros((4 * D,), DTYPE)
    b2 = jnp.zeros((D,), DTYPE)
    return ln_ffn_residual(x, scale, bias, W1, b1, W2, b2)


def ff_xla(x):
    xn = ln(x)
    return x + jnp.maximum(xn @ W1, 0) @ W2


PIECES = {
    # name: fn (ef, nf) -> (ef, nf); every output depends on the carry
    "ln_ef": lambda e, n: (ln(e), n),
    "gather_s": lambda e, n: (e + jnp.take(n, senders, axis=0), n),
    "gather_sr": lambda e, n: (e + jnp.take(n, senders, axis=0)
                               + jnp.take(n, receivers, axis=0), n),
    "edge_mm": lambda e, n: (e @ W0, n),
    "edge_update_split": lambda e, n: (
        e @ W0 + jnp.take(n @ W0, senders, axis=0)
        + jnp.take(n @ W0, receivers, axis=0), n),
    "edge_update_split_bar": lambda e, n: (
        e @ W0
        + jax.lax.optimization_barrier(jnp.take(n @ W0, senders, axis=0))
        + jax.lax.optimization_barrier(
            jnp.take(n @ W0, receivers, axis=0)), n),
    "edge_update_ln_mm": lambda e, n: (
        __import__("graphnets_tpu.ops.pallas.ln_linear",
                   fromlist=["ln_matmul"]).ln_matmul(
            e, scale, bias, W0).astype(DTYPE)
        + jnp.take(n @ W0, senders, axis=0)
        + jnp.take(n @ W0, receivers, axis=0), n),
    "segsum_pallas": lambda e, n: (e, seg_pallas(e)[:N] @ W0 + n @ W0),
    "segsum_xla": lambda e, n: (e, jax.ops.segment_sum(
        e.astype(jnp.float32), receivers, num_segments=N,
        indices_are_sorted=True).astype(e.dtype) @ W0 + n @ W0),
    "gather_r_pallas": lambda e, n: (
        e + __import__("graphnets_tpu.ops.pallas.gather",
                       fromlist=["sorted_gather"]).sorted_gather(
            n, receivers), n),
    "gather_r_xla": lambda e, n: (
        e + jnp.take(n, receivers, axis=0, indices_are_sorted=True), n),
    "ff_edges_fused": lambda e, n: (ff_fused(e), n),
    "ff_edges_xla": lambda e, n: (ff_xla(e), n),
    "ff_nodes_fused": lambda e, n: (e, ff_fused(n)),
    "residuals": lambda e, n: (e + e, n + n),
    "coupling": lambda e, n: (e, n),
}


def timed(step):
    def make(length):
        @jax.jit
        def f(c):
            def body(c, _):
                e, n = step(*c)
                # Couple e to n so NEITHER carry is loop-invariant: pieces
                # that leave e untouched (segsum_*, ff_nodes) would
                # otherwise have their e-consuming op hoisted out of the
                # scan by LICM and report ~0.  Cost of the coupling itself
                # is the "coupling" piece — subtract it.
                e = e + n[:1].astype(e.dtype) * jnp.float32(1e-3).astype(
                    e.dtype)
                return (e.astype(DTYPE), n.astype(DTYPE)), None
            c2, _ = jax.lax.scan(body, c, None, length=length)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in c2)
        return f

    times = {}
    for length in (L1, L2):
        f = make(length)
        float(f((ef0, nf0)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f((ef0, nf0)))
            best = min(best, time.perf_counter() - t0)
        times[length] = best
    return (times[L2] - times[L1]) / (L2 - L1)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("pieces", nargs="*", default=None)
    args = ap.parse_args()
    names = args.pieces or list(PIECES)
    for name in names:
        t = timed(PIECES[name])
        print(f"{name:22s} {t*1e3:8.2f} ms", flush=True)
