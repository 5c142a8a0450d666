#!/usr/bin/env python
"""Compiled-on-TPU kernel correctness capture.

Interpret-mode tests (tests/test_pallas_kernels.py) validate kernel math on
CPU; this script runs every Pallas kernel COMPILED through Mosaic on the
real chip and judges it against an f64 ORACLE computed on CPU.

Why an oracle, not kernel-vs-reference elementwise: kernel and pure-XLA
reference legitimately round at different points (e.g. the fused FFN keeps
its hidden activation in f32 VMEM where the unfused path materializes bf16;
the MXU's DEFAULT precision rounds f32 operands to bf16).  The correctness
criterion is therefore: the kernel's deviation from the exact (f64) result
is at most ~3x the pure-XLA reference's own deviation, plus one bf16-ulp
floor.  An actual miscompile (wrong data movement, race, bad index math)
shows up as O(0.1..1) scaled error and fails loudly.

Numbers go into benchmarks/RESULTS.md.
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
CPU = jax.devices("cpu")[0]


def oracle(fn, *args):
    """Run ``fn`` on CPU in f64 (inputs are exact f32/bf16 values)."""
    with jax.enable_x64(True):
        with jax.default_device(CPU):
            cast = [jnp.asarray(np.asarray(a, np.float64))
                    if hasattr(a, "dtype") and jnp.issubdtype(
                        np.asarray(a).dtype, np.floating)
                    else (jax.device_put(a, CPU) if hasattr(a, "dtype")
                          else a)
                    for a in args]
            out = fn(*cast)
            return jax.tree_util.tree_map(
                lambda t: np.asarray(t, np.float64), out)


def record(name, out, ref, orc, bf16_out=True):
    out = np.asarray(out, np.float64)
    ref = np.asarray(ref, np.float64)
    orc = np.asarray(orc, np.float64)
    scale = max(float(np.abs(orc).max()), 1e-12)
    err_k = float(np.abs(out - orc).max()) / scale
    err_r = float(np.abs(ref - orc).max()) / scale
    floor = 2e-2 if bf16_out else 2e-5
    gate = max(3.0 * err_r, floor)
    ok = err_k <= gate
    results[name] = {"kernel_err": err_k, "ref_err": err_r, "gate": gate,
                     "pass": bool(ok)}
    print(f"{name:34s} kernel={err_k:.3e}  xla_ref={err_r:.3e}  "
          f"gate={gate:.3e}  {'PASS' if ok else 'FAIL'}", flush=True)


# ---- exact-math oracles (no downcasts; autodiffed for backward) -----------

def m_ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) / (jnp.sqrt(var) + eps) * scale + bias


def m_ln_matmul(x, scale, bias, w, addend):
    out = m_ln(x, scale, bias) @ w
    return out if addend is None else out + addend


def m_ln_ffn(x, scale, bias, w1, b1, w2, b2, extra):
    y = jnp.maximum(m_ln(x, scale, bias) @ w1 + b1, 0) @ w2 + b2
    out = x + y
    return out if extra is None else out + extra


def main():
    # -- sorted segment sum (bf16 and f32) ----------------------------------
    from graphnets_tpu.ops.pallas.segment_sum import (sorted_segment_sum,
                                                      windowed_segment_sum)
    E, N, D = 16384, 1024, 384
    seg_np = np.sort(rng.integers(0, N, E)).astype(np.int32)
    seg = jnp.asarray(seg_np)

    def m_segsum(x):
        return jax.ops.segment_sum(x, jnp.asarray(seg_np),
                                   num_segments=N)

    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), dtype)
        out = jax.jit(lambda x: sorted_segment_sum(x, seg, N))(x)
        ref = jax.ops.segment_sum(x.astype(jnp.float32), seg,
                                  num_segments=N, indices_are_sorted=True)
        orc = oracle(m_segsum, x.astype(jnp.float32))
        record(f"sorted_segment_sum/{tag}", out.astype(jnp.float32), ref,
               orc, bf16_out=(dtype == jnp.bfloat16))

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

    def m_winsum(xx):
        return jax.ops.segment_sum(xx, jnp.asarray(senders),
                                   num_segments=N)

    orc = oracle(m_winsum, x.astype(jnp.float32))
    record("windowed_segment_sum/bf16", out.astype(jnp.float32), ref, orc)

    # -- sorted gather (receiver-term forward; transpose of segsum) ---------
    # Each output row passes through exactly one one-hot product with f32
    # accumulate, so the kernel should match jnp.take EXACTLY (gate is the
    # harness floor).
    from graphnets_tpu.ops.pallas.gather import sorted_gather
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        tab = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), dtype)
        out = jax.jit(lambda t: sorted_gather(t, seg))(tab)
        ref = jnp.take(tab, seg, axis=0, indices_are_sorted=True)

        def m_gather(t):
            return jnp.take(t, jnp.asarray(seg_np), axis=0)

        orc = oracle(m_gather, tab.astype(jnp.float32))
        record(f"sorted_gather/{tag}", out.astype(jnp.float32),
               ref.astype(jnp.float32), orc,
               bf16_out=(dtype == jnp.bfloat16))

    # -- fused gather + addend ---------------------------------------------
    from graphnets_tpu.ops.pallas.gather import sorted_gather_add
    tab = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                      jnp.bfloat16)
    add = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    out = jax.jit(lambda t, a: sorted_gather_add(t, seg, a))(tab, add)
    ref = jnp.take(tab, seg, axis=0).astype(jnp.float32) + add

    def m_gather_add(t, a):
        return jnp.take(t, jnp.asarray(seg_np), axis=0) + a

    orc = oracle(m_gather_add, tab.astype(jnp.float32), add)
    record("sorted_gather_add/bf16+f32", out.astype(jnp.float32), ref, orc,
           bf16_out=False)

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
    f32args = tuple(a.astype(jnp.float32) for a in args)
    orc = oracle(m_ln_ffn, xb.astype(jnp.float32), *f32args,
                 extra.astype(jnp.float32))
    record("ln_ffn_residual/fwd", out.astype(jnp.float32),
           ref.astype(jnp.float32), orc)

    ct = mk(T, d).astype(jnp.bfloat16)

    def loss(f, x):
        return jnp.sum(f(x, *args, extra=extra).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    g_out = jax.jit(jax.grad(lambda x: loss(ln_ffn_residual, x)))(xb)
    g_ref = jax.grad(lambda x: loss(ln_ffn_residual_reference, x))(xb)
    g_orc = oracle(
        lambda x, *a: jax.grad(
            lambda xx: jnp.sum(m_ln_ffn(xx, *a[:-1]) * a[-1]))(x),
        xb.astype(jnp.float32), *f32args, extra.astype(jnp.float32),
        ct.astype(jnp.float32))
    record("ln_ffn_residual/bwd_dx", g_out.astype(jnp.float32),
           g_ref.astype(jnp.float32), g_orc)

    # -- fused LN->matmul (addend variant) ----------------------------------
    from graphnets_tpu.ops.pallas.ln_linear import (ln_matmul,
                                                    ln_matmul_reference)
    w0 = (mk(d, d) * 0.05).astype(jnp.bfloat16)
    addend = mk(T, d)
    scale, bias = mk(d), mk(d)
    out = jax.jit(lambda x: ln_matmul(x, scale, bias, w0, addend=addend))(xb)
    ref = ln_matmul_reference(xb, scale, bias, w0, addend=addend)
    orc = oracle(m_ln_matmul, xb.astype(jnp.float32), scale, bias,
                 w0.astype(jnp.float32), addend)
    record("ln_matmul/fwd", out.astype(jnp.float32),
           ref.astype(jnp.float32), orc)
    g_out = jax.jit(jax.grad(lambda x: jnp.sum(
        ln_matmul(x, scale, bias, w0, addend=addend).astype(jnp.float32)
        * ct.astype(jnp.float32))))(xb)
    g_ref = jax.grad(lambda x: jnp.sum(
        ln_matmul_reference(x, scale, bias, w0,
                            addend=addend).astype(jnp.float32)
        * ct.astype(jnp.float32)))(xb)
    g_orc = oracle(
        lambda x, s, b, w, a, c: jax.grad(
            lambda xx: jnp.sum(m_ln_matmul(xx, s, b, w, a) * c))(x),
        xb.astype(jnp.float32), scale, bias, w0.astype(jnp.float32),
        addend, ct.astype(jnp.float32))
    record("ln_matmul/bwd_dx", g_out.astype(jnp.float32),
           g_ref.astype(jnp.float32), g_orc)

    # -- fused SDDMM edge update fwd + bwd ----------------------------------
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
    eg_np = np.repeat(np.arange(G, dtype=np.int32), e_slots)

    def m_edge_update(ef, s, b, w, ts_, tr_, tg_, bb_):
        return (m_ln(ef, s, b) @ w + ts_[senders] + tr_[receivers]
                + tg_[eg_np] + bb_)

    out = jax.jit(lambda ef, ts, tr, tg: fused_edge_update(
        ef, ln_p, w0, ts, tr, tg, bb, s_j, r_j, n_slots, e_slots))(
            efb, ts, tr, tg)
    ref = fused_edge_update_reference(efb, ln_p, w0, ts, tr, tg, bb,
                                      s_j, r_j, e_slots)
    orc = oracle(m_edge_update, efb.astype(jnp.float32), scale, bias,
                 w0.astype(jnp.float32), ts, tr, tg, bb)
    record("fused_edge_update/fwd", out.astype(jnp.float32),
           ref.astype(jnp.float32), orc)
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
    g_orc = oracle(
        lambda ef, s, b, w, ts_, tr_, tg_, bb_, c: jax.grad(
            lambda *diff: jnp.sum(
                m_edge_update(diff[0], s, b, w, diff[1], diff[2], diff[3],
                              bb_) * c),
            argnums=(0, 1, 2, 3))(ef, ts_, tr_, tg_),
        efb.astype(jnp.float32), scale, bias, w0.astype(jnp.float32),
        ts, tr, tg, bb, ct_e.astype(jnp.float32))
    for name, a, b, o in zip(("d_ef", "d_ts", "d_tr", "d_tg"),
                             g_out, g_ref, g_orc):
        # d_ts/d_tr/d_tg are f32 partials but reduced from a bf16 cotangent,
        # so the bf16 floor applies to every component.
        record(f"fused_edge_update/bwd_{name}", a.astype(jnp.float32),
               b.astype(jnp.float32), o)

    # -- fused G=1 edge update with in-kernel segment sum -------------------
    from graphnets_tpu.ops.pallas.edge_update_g1 import (
        fused_g1_edge_update_agg, _reference2, supports_g1_edge_update)
    Eg, Ng, dg = 8192, 512, 256
    rlg_np = np.sort(rng.integers(0, Ng, size=Eg)).astype(np.int32)
    rlg = jnp.asarray(rlg_np)
    efg = jnp.asarray(rng.normal(size=(Eg, dg)).astype(np.float32),
                      jnp.bfloat16)
    srcg = jnp.asarray(rng.normal(size=(Eg, dg)).astype(np.float32),
                       jnp.bfloat16)
    trg = jnp.asarray(rng.normal(size=(Ng, dg)).astype(np.float32),
                      jnp.bfloat16)
    w0g = jnp.asarray((rng.normal(size=(dg, dg)) * 0.05).astype(np.float32),
                      jnp.bfloat16)
    gbg = jnp.asarray(rng.normal(size=(dg,)).astype(np.float32))
    sg_ = jnp.asarray(rng.normal(size=(dg,)).astype(np.float32))
    bg_ = jnp.asarray(rng.normal(size=(dg,)).astype(np.float32))
    assert supports_g1_edge_update(Eg, Ng, dg, dg, 2, with_agg=True)
    ln_g = {"scale": sg_, "bias": bg_}
    h_g, agg_g = jax.jit(lambda *a: fused_g1_edge_update_agg(
        *a, rlg, gbg))(efg, ln_g, w0g, srcg, trg)
    h_r, agg_r = _reference2(efg, sg_, bg_, w0g, srcg, trg, rlg, gbg, True)

    def m_g1_agg(ef, s, b, w, src, tr, gb):
        h = m_ln(ef, s, b) @ w + src + jnp.take(
            tr, jnp.asarray(rlg_np), axis=0) + gb
        seg = jax.ops.segment_sum(h, jnp.asarray(rlg_np),
                                  num_segments=Ng,
                                  indices_are_sorted=True)
        return h, seg

    orc_h, orc_agg = oracle(m_g1_agg, efg.astype(jnp.float32), sg_, bg_,
                            w0g.astype(jnp.float32),
                            srcg.astype(jnp.float32),
                            trg.astype(jnp.float32), gbg)
    record("fused_g1_agg/fwd_h", h_g.astype(jnp.float32),
           h_r.astype(jnp.float32), orc_h)
    record("fused_g1_agg/fwd_agg", agg_g, agg_r, orc_agg)

    import json
    print(json.dumps({"tpu_kernel_check": results}))
    bad = {k: v for k, v in results.items() if not v["pass"]}
    if bad:
        print(f"FAILURES: {sorted(bad)}", file=sys.stderr)
        sys.exit(1)
    print("all kernels within oracle tolerance on compiled TPU",
          file=sys.stderr)


if __name__ == "__main__":
    main()
