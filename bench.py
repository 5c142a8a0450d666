#!/usr/bin/env python
"""Headline benchmark: edges/s/chip for a 3-core GNBlock stack.

Workload (BASELINE.md): batch of random directed graphs (128 nodes, avg
degree 16 per node) through 3 residual GNCores at dims (384, 384, 384),
forward pass, bf16 activations.

``vs_baseline`` compares against the *reference's design on the same chip*:
the dense PN^2 broadcaster batched-matmul formulation of GraphNets.jl
(``/root/reference/src/gngraphbatch.jl``) implemented in JAX and run on the
same hardware with the same numerics — the reference itself publishes no
numbers (BASELINE.md), so the measured dense-design throughput is the
baseline denominator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from graphnets_tpu.models.gn_core import GNCore, GNCoreList
from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
# Measured on v5e: the Pallas sorted-segment-sum + small-segment one-hot
# paths cut per-core aggregation cost ~2x (benchmarks/RESULTS.md).
enable_pallas(True)

# Workload config
B, N_PER_G, DEG, D = 8, 128, 16, 384
DTYPE = jnp.bfloat16
WARMUP, ITERS = 3, 10


def build_graphs(seed=0):
    """Build the workload through the public ``batch()`` API with the
    uniform slot layout (``PadSpec.uniform``): each graph is a random
    directed graph with exactly DEG in-edges per node (distinct senders, so
    it is adjacency-representable), batched heterogeneously.  The resulting
    ``slot_shape`` routes the edge update through the fused SDDMM kernel —
    the same path any user hits with ``batch(..., PadSpec.uniform(...))``.
    """
    from graphnets_tpu.graph import PadSpec, batch
    rng = np.random.default_rng(seed)
    E = N_PER_G * DEG
    N = N_PER_G
    adjs, efs, nfs, gfs = [], [], [], []
    for b in range(B):
        adj = np.zeros((N, N), np.int64)
        for r in range(N):
            adj[rng.choice(N, size=DEG, replace=False), r] = 1
        adjs.append(adj)
        efs.append(rng.normal(size=(E, D)).astype(np.float32))
        nfs.append(rng.normal(size=(N, D)).astype(np.float32))
        gfs.append(rng.normal(size=(D,)).astype(np.float32))
    g = batch({"graphs": adjs, "ef": efs, "nf": nfs,
               "gf": np.stack(gfs)}, pad=PadSpec.uniform(N, E))
    assert g.slot_shape == (N, E) and not g.pad_aliases_real
    sg = np.asarray(g.senders)
    rg = np.asarray(g.receivers)
    ef = np.asarray(g.ef)
    nf = np.asarray(g.nf)
    gf = np.asarray(g.gf)
    g = g.with_features(ef=g.ef.astype(DTYPE), nf=g.nf.astype(DTYPE),
                        gf=g.gf.astype(DTYPE))
    return g, (sg, rg, ef, nf, gf)


def cast_params(p):
    return jax.tree_util.tree_map(lambda x: x.astype(DTYPE), p)


def differenced_time(times, l1, l2):
    """Per-iteration time from two scan-length wall times.

    Raises if the difference is non-positive: a longer scan measuring
    FASTER than a shorter one is physically impossible per-iteration and
    means the capture is corrupted (tunnel noise, preempted host, ...) —
    writing it to an artifact (as round 4 did with "-85.70 ms") must be
    impossible.
    """
    dt = (times[l2] - times[l1]) / (l2 - l1)
    if not dt > 0:
        raise RuntimeError(
            f"non-positive differenced timing: t({l1})={times[l1]:.4f}s "
            f"t({l2})={times[l2]:.4f}s -> {dt*1e3:.3f} ms/iter; "
            "capture corrupted, refusing to report")
    return dt


def time_iterated(step_fn, carry, l1=10, l2=100, trials=6, retries=2):
    """Per-iteration device time of ``carry -> carry`` via in-jit lax.scan.

    The axon tunnel acks before device completion (block_until_ready does
    not actually block), and a host readback costs ~20+ ms fixed overhead —
    so we iterate inside jit at two lengths, force a scalar readback, and
    difference out the fixed cost.  Long scans (10 vs 100) keep dispatch
    pipelining effects out of the per-iteration estimate (short scans
    overestimate by ~2x through the tunnel).

    A non-positive difference (longer scan timed faster) is a corrupted
    capture: re-measure up to ``retries`` times, then raise — never return
    garbage (see ``differenced_time``).
    """
    def make(length):
        @jax.jit
        def f(c):
            def body(c, _):
                return step_fn(c), None
            c2, _ = jax.lax.scan(body, c, None, length=length)
            leaves = [l for l in jax.tree_util.tree_leaves(c2)
                      if hasattr(l, "astype") and jnp.issubdtype(
                          l.dtype, jnp.floating)]
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return f

    fns = {length: make(length) for length in (l1, l2)}
    for length, f in fns.items():
        float(f(carry))  # compile + warm
    last_err = None
    for _ in range(retries + 1):
        times = {}
        for length, f in fns.items():
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                float(f(carry))  # readback forces completion
                best = min(best, time.perf_counter() - t0)
            times[length] = best
        try:
            return differenced_time(times, l1, l2)
        except RuntimeError as e:
            last_err = e
    raise last_err


def bench_sparse(g, params, stack):
    return time_iterated(lambda x: stack.apply(params, x), g)


def make_dense_inputs(raw):
    """Dense PN^2 formulation of the same workload: 0/1 broadcaster tensors
    exactly as the reference materializes them (feature-last layout)."""
    sg, rg, ef, nf, gf = raw
    PN, PE = N_PER_G, N_PER_G * N_PER_G
    src_b = np.zeros((B, PN, PE), np.float32)
    dst_b = np.zeros((B, PN, PE), np.float32)
    e2n = np.zeros((B, PE, PN), np.float32)
    e2g = np.zeros((B, PE, 1), np.float32)
    ef_d = np.zeros((B, PE, D), np.float32)
    for k in range(len(sg)):
        b = k // (N_PER_G * DEG)
        s = sg[k] - b * N_PER_G
        r = rg[k] - b * N_PER_G
        slot = r * PN + s
        src_b[b, s, slot] = 1.0
        dst_b[b, r, slot] = 1.0
        e2n[b, slot, r] = 1.0
        e2g[b, slot, 0] = 1.0
        ef_d[b, slot] = ef[k]
    nf_d = nf.reshape(B, PN, D)
    bcasts = (jnp.asarray(src_b, DTYPE), jnp.asarray(dst_b, DTYPE),
              jnp.asarray(e2n, DTYPE), jnp.asarray(e2g, DTYPE))
    feats = (jnp.asarray(ef_d, DTYPE), jnp.asarray(nf_d, DTYPE),
             jnp.asarray(gf[:, None, :], DTYPE))
    return bcasts, feats


def dense_core_stack(params, bcasts, feats):
    """3 GNCores in the reference's dense dataflow (batched matmuls against
    broadcasters; LN/FF over every dense slot, as the reference does)."""
    src_b, dst_b, e2n, e2g = bcasts
    ef, nf, gf = feats  # gf: [B,1,D]
    n2g = jnp.ones((B, N_PER_G, 1), DTYPE)
    g2e = jnp.swapaxes(e2g, 1, 2)  # [B,1,PE]
    g2n = jnp.swapaxes(n2g, 1, 2)

    def ln(x, p):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        safe = jnp.where(var > 0, var, 1.0)
        std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
        return ((xf - mu) / (std + 1e-5) * p["scale"] + p["bias"]).astype(
            x.dtype)

    def lin(x, p):
        return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)

    def ff(x, p):
        return lin(jnp.maximum(lin(x, p["0"]), 0), p["1"])

    def block(p, ef, nf, gf):
        src = jnp.einsum("bnd,bne->bed", nf, src_b)
        dst = jnp.einsum("bnd,bne->bed", nf, dst_b)
        gfe = jnp.einsum("bgd,bge->bed", gf, g2e)
        h_ef = lin(jnp.concatenate([ef, src, dst, gfe], -1), p["edgefn"])
        agg = jnp.einsum("bed,ben->bnd", h_ef, e2n)
        gfn = jnp.einsum("bgd,bgn->bnd", gf, g2n)
        h_nf = lin(jnp.concatenate([agg, nf, gfn], -1), p["nodefn"])
        ep = jnp.einsum("bed,beg->bgd", h_ef, e2g)
        np_ = jnp.einsum("bnd,bng->bgd", h_nf, n2g)
        h_gf = lin(jnp.concatenate([ep, np_, gf], -1), p["graphfn"])
        return h_ef, h_nf, h_gf

    def core(p, ef, nf, gf):
        bef, bnf, bgf = block(
            p["block"],
            ln(ef, p["gn1"]["edgeln"]), ln(nf, p["gn1"]["nodeln"]),
            ln(gf, p["gn1"]["graphln"]))
        fef = ff(ln(ef, p["gn2"]["edgeln"]), p["ffwd"]["eff"])
        fnf = ff(ln(nf, p["gn2"]["nodeln"]), p["ffwd"]["nff"])
        fgf = ff(ln(gf, p["gn2"]["graphln"]), p["ffwd"]["gff"])
        return ef + bef + fef, nf + bnf + fnf, gf + bgf + fgf

    for i in range(3):
        ef, nf, gf = core(params[str(i)], ef, nf, gf)
    return ef, nf, gf


def main():
    g, raw = build_graphs()
    stack = GNCoreList([GNCore((D, D, D)) for _ in range(3)])
    params = cast_params(stack.init(jax.random.PRNGKey(0)))
    n_edges = int(np.sum(np.asarray(g.n_edge)))

    t_sparse = bench_sparse(g, params, stack)
    ours = n_edges / t_sparse
    print(f"# sparse: {ours:.3e} edges/s  step {t_sparse*1e3:.2f} ms",
          file=sys.stderr, flush=True)

    vs_baseline = None
    try:
        bcasts, feats = make_dense_inputs(raw)
        t_dense = time_iterated(
            lambda f: dense_core_stack(params, bcasts, f), feats)
        dense = n_edges / t_dense
        vs_baseline = ours / dense
        print(f"# sparse: {ours:.3e} edges/s  dense-ref-design: "
              f"{dense:.3e} edges/s  step {t_sparse*1e3:.2f} ms vs "
              f"{t_dense*1e3:.2f} ms", file=sys.stderr)
    except Exception as e:  # dense baseline may OOM on small chips
        print(f"# dense baseline failed: {e}", file=sys.stderr)
        vs_baseline = 1.0

    print(json.dumps({
        "metric": "edges_per_s_per_chip_3core_gnblock_stack_fwd",
        "value": ours,
        "unit": "edges/s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
