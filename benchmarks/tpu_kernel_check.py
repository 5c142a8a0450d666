#!/usr/bin/env python
"""Compiled-on-TPU kernel correctness capture (VERDICT r1 item 8).

Interpret-mode tests (tests/test_pallas_kernels.py) validate kernel math on
CPU; this script runs every Pallas kernel COMPILED through Mosaic on the
real chip and compares against the pure-XLA references, closing the
interpret-vs-Mosaic gap.  Numbers go into benchmarks/RESULTS.md.
"""

import sys
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)  # compiled, NOT interpret

rng = np.random.default_rng(0)
results = {}


def record(name, out, ref):
    out = np.asarray(out, np.float64)
    ref = np.asarray(ref, np.float64)
    denom = np.maximum(np.abs(ref), 1e-3)
    rel = float(np.max(np.abs(out - ref) / denom))
    results[name] = rel
    print(f"{name:40s} max_rel_err={rel:.3e}", flush=True)
    return rel


def main():
    # -- sorted segment sum (bf16 and f32) ----------------------------------
    from graphnets_tpu.ops.pallas.segment_sum import (sorted_segment_sum,
                                                      windowed_segment_sum)
    E, N, D = 16384, 1024, 384
    seg = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), dtype)
        out = jax.jit(lambda x: sorted_segment_sum(x, seg, N))(x)
        ref = jax.ops.segment_sum(x.astype(jnp.float32), seg,
                                  num_segments=N, indices_are_sorted=True)
        record(f"sorted_segment_sum/{tag}", out.astype(jnp.float32), ref)

    # -- windowed segment sum (senders-style ids) ---------------------------
    G, n_slots, e_slots = 8, 128, 2048
    senders = np.concatenate([
        rng.integers(b * n_slots, (b + 1) * n_slots, e_slots)
        for b in range(G)]).astype(np.int32)
    gi = jnp.arange(G + 1, dtype=jnp.int32)
    x = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32),
                    jnp.bfloat16)
    out = jax.jit(lambda x: windowed_segment_sum(
        x, jnp.asarray(senders), N, gi * n_slots, gi * e_slots))(x)
    ref = jax.ops.segment_sum(x.astype(jnp.float32), jnp.asarray(senders),
                              num_segments=N)
    record("windowed_segment_sum/bf16", out.astype(jnp.float32), ref)

    # -- fused LN-FFN-residual fwd + bwd ------------------------------------
    from graphnets_tpu.ops.pallas.fused_ffn import (ln_ffn_residual,
                                                    ln_ffn_residual_reference)
    d = 384
    T = 4096
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    xb = mk(T, d).astype(jnp.bfloat16)
    extra = mk(T, d).astype(jnp.bfloat16)
    args = (mk(d), mk(d), (mk(d, 4 * d) * 0.05).astype(jnp.bfloat16),
            mk(4 * d).astype(jnp.bfloat16),
            (mk(4 * d, d) * 0.05).astype(jnp.bfloat16),
            mk(d).astype(jnp.bfloat16))
    out = jax.jit(lambda x: ln_ffn_residual(x, *args, extra=extra))(xb)
    ref = ln_ffn_residual_reference(xb, *args, extra=extra)
    record("ln_ffn_residual/fwd", out.astype(jnp.float32),
           ref.astype(jnp.float32))

    ct = mk(T, d).astype(jnp.bfloat16)

    def loss(f, x):
        return jnp.sum(f(x, *args, extra=extra).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    g_out = jax.jit(jax.grad(lambda x: loss(ln_ffn_residual, x)))(xb)
    g_ref = jax.grad(lambda x: loss(ln_ffn_residual_reference, x))(xb)
    record("ln_ffn_residual/bwd_dx", g_out.astype(jnp.float32),
           g_ref.astype(jnp.float32))

    # -- fused LN->matmul (addend variant) -----------------------------------
    from graphnets_tpu.ops.pallas.ln_linear import (ln_matmul,
                                                    ln_matmul_reference)
    w0 = (mk(d, d) * 0.05).astype(jnp.bfloat16)
    addend = mk(T, d)
    scale, bias = mk(d), mk(d)
    out = jax.jit(lambda x: ln_matmul(x, scale, bias, w0, addend=addend))(xb)
    ref = ln_matmul_reference(xb, scale, bias, w0, addend=addend)
    record("ln_matmul/fwd", out.astype(jnp.float32), ref.astype(jnp.float32))
    g_out = jax.jit(jax.grad(lambda x: jnp.sum(
        ln_matmul(x, scale, bias, w0, addend=addend).astype(jnp.float32)
        * ct.astype(jnp.float32))))(xb)
    g_ref = jax.grad(lambda x: jnp.sum(
        ln_matmul_reference(x, scale, bias, w0,
                            addend=addend).astype(jnp.float32)
        * ct.astype(jnp.float32)))(xb)
    record("ln_matmul/bwd_dx", g_out.astype(jnp.float32),
           g_ref.astype(jnp.float32))

    # -- fused SDDMM edge update fwd + bwd -----------------------------------
    from graphnets_tpu.ops.pallas.edge_update import (
        fused_edge_update, fused_edge_update_reference)
    EE = G * e_slots
    NN = G * n_slots
    efb = mk(EE, d).astype(jnp.bfloat16)
    receivers = np.concatenate([
        np.sort(rng.integers(b * n_slots, (b + 1) * n_slots, e_slots))
        for b in range(G)]).astype(np.int32)
    s_j, r_j = jnp.asarray(senders), jnp.asarray(receivers)
    ln_p = {"scale": scale, "bias": bias}
    ts, tr, tg, bb = mk(NN, d), mk(NN, d), mk(G, d), mk(d)
    out = jax.jit(lambda ef, ts, tr, tg: fused_edge_update(
        ef, ln_p, w0, ts, tr, tg, bb, s_j, r_j, n_slots, e_slots))(
            efb, ts, tr, tg)
    ref = fused_edge_update_reference(efb, ln_p, w0, ts, tr, tg, bb,
                                      s_j, r_j, e_slots)
    record("fused_edge_update/fwd", out.astype(jnp.float32),
           ref.astype(jnp.float32))
    ct_e = mk(EE, d).astype(jnp.bfloat16)

    def eloss(f, ef, ts, tr, tg, **kw):
        return jnp.sum(f(ef, ln_p, w0, ts, tr, tg, bb, s_j, r_j, **kw)
                       .astype(jnp.float32) * ct_e.astype(jnp.float32))

    g_out = jax.jit(jax.grad(
        lambda ef, ts, tr, tg: eloss(fused_edge_update, ef, ts, tr, tg,
                                     n_slots=n_slots, e_slots=e_slots),
        argnums=(0, 1, 2, 3)))(efb, ts, tr, tg)
    g_ref = jax.grad(
        lambda ef, ts, tr, tg: eloss(fused_edge_update_reference, ef, ts,
                                     tr, tg, e_slots=e_slots),
        argnums=(0, 1, 2, 3))(efb, ts, tr, tg)
    for name, a, b in zip(("d_ef", "d_ts", "d_tr", "d_tg"), g_out, g_ref):
        record(f"fused_edge_update/bwd_{name}", a.astype(jnp.float32),
               b.astype(jnp.float32))

    import json
    print(json.dumps({"tpu_kernel_check": results}))
    bad = {k: v for k, v in results.items() if v > 5e-2}
    if bad:
        print(f"FAILURES: {bad}", file=sys.stderr)
        sys.exit(1)
    print("all kernels within tolerance on compiled TPU", file=sys.stderr)


if __name__ == "__main__":
    main()
