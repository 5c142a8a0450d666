#!/usr/bin/env python
"""Micro-experiments: segment-sum tile sizes and TE choices on the headline
and 1M-edge shapes."""

import sys, time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from graphnets_tpu.ops.pallas.segment_sum import _forward
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()


def timed(step, carry, l1=10, l2=100):
    def make(length):
        @jax.jit
        def f(c):
            def body(c, _):
                return step(c), None
            c2, _ = jax.lax.scan(body, c, None, length=length)
            return jnp.sum(c2[0].astype(jnp.float32)) + jnp.sum(
                c2[1].astype(jnp.float32))
        return f
    times = {}
    for length in (l1, l2):
        f = make(length)
        float(f(carry))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(carry))
            best = min(best, time.perf_counter() - t0)
        times[length] = best
    return (times[l2] - times[l1]) / (l2 - l1)


def run(E, N, D, dtype, l1, l2):
    rng = np.random.default_rng(0)
    seg = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    x0 = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), dtype)
    n0 = jnp.zeros((N, D), dtype)
    print(f"E={E} N={N} D={D} {x0.dtype}:")
    for te in (1024, 2048, 4096):
        for tn in (128, 256, 512):
            if N % tn and tn > N:
                continue
            try:
                def step(c, te=te, tn=tn):
                    x, n = c
                    out = _forward(x, seg, N, te=te, tn=tn)
                    x2 = x + jnp.take(out, seg, axis=0) * 1e-6
                    return (x2.astype(dtype), out.astype(dtype))
                t = timed(step, (x0, n0), l1, l2)
                print(f"  TE={te:5d} TN={tn:4d}: {t*1e6:9.1f} us",
                      flush=True)
            except Exception as e:
                print(f"  TE={te:5d} TN={tn:4d}: fail {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    run(16384, 1024, 384, jnp.bfloat16, 10, 100)
    run(1048576, 65536, 256, jnp.bfloat16, 2, 12)
