#!/usr/bin/env python
"""OGB device-step decomposition (round-5 ask #5).

The arxiv/products pipeline is device-bound (~21.6 / 25.8 ms in r4); this
ablation decomposes the device step on the arxiv-shaped subgraph
(56,833-node / 56,320-edge fanout-(10,10) batch, hidden 256, 2 cores):

  A. feature gather only (the [N_sub, 128] take from the device table)
  B. forward only
  C. forward + backward (grads, no optimizer)
  D. full step (fwd + bwd + Adam)

each via the honest in-jit-scan harness, plus the achieved-MFU figure for
the full step from a FLOP count of the model.
"""

import sys
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from graphnets_tpu.data.large_graph import (NeighborSampler,
                                            device_feature_table)
from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.training.losses import masked_logit_crossentropy
from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)

import bench  # noqa: E402
from benchmarks.bench_arxiv import make_arxiv_shaped  # noqa: E402

N_CLASSES, D_FEAT, HIDDEN, N_CORES, BATCH = 40, 128, 256, 2, 512
DTYPE = jnp.bfloat16


def model_step_flops(n_nodes, n_edges, de=HIDDEN, d_feat=D_FEAT,
                     n_cores=N_CORES, n_classes=N_CLASSES):
    """Matmul FLOPs of one full train step (fwd + bwd ~ 3x fwd)."""
    N, E, D = n_nodes, n_edges, de
    f = 0
    # encoder (0, d_feat, 0) -> (D, D, D): edge in 2*d_feat, node in d_feat+D
    f += 2 * E * (2 * d_feat) * D + 2 * N * (d_feat + D) * D
    # per core: split-linear edge update (ef term at E, ts/tr at N, g small)
    per_core = (2 * E * D * D + 2 * 2 * N * D * D      # edge fn
                + 2 * N * (2 * D + D) * D              # node fn (agg,nf,gf)
                + 2 * E * 2 * D * 4 * D                # ffn ef
                + 2 * N * 2 * D * 4 * D)               # ffn nf
    f += n_cores * per_core
    # decoder (D,D,D) -> (1, n_classes, 0)
    f += 2 * E * (3 * D) * 1 + 2 * N * (D + 1 + D) * n_classes
    return 3 * f  # bwd ~= 2x fwd


def main():
    g = make_arxiv_shaped()
    sampler = NeighborSampler(g, fanouts=(10, 10), batch_size=BATCH,
                              seed=1, emit_node_ids=True)
    feat_dev = device_feature_table(g, DTYPE)
    b = next(sampler.epoch(np.arange(g.num_nodes)))
    graph0 = b.graph
    NP, EP = graph0.num_node_slots, graph0.num_edge_slots
    print(f"# subgraph: {NP} node slots, {EP} edge slots", file=sys.stderr)

    model = EncodeProcessDecode((0, D_FEAT, 0), (HIDDEN,) * 3,
                                (1, N_CLASSES, 0), n_cores=N_CORES)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    from bench import cast_params as cast_p

    def with_feat(feat):
        return graph0.with_features(nf=jnp.take(feat, b.node_ids, axis=0))

    # A: gather only (tiny data-dependent feedback so the gather is live;
    # 1e-30 underflows in bf16 but is not provably zero to XLA)
    t_a = bench.time_iterated(
        lambda f: f + (jnp.sum(with_feat(f).nf.astype(jnp.float32))
                       * 1e-30).astype(DTYPE), feat_dev)
    print(f"A feature gather:  {t_a*1e3:6.2f} ms", file=sys.stderr,
          flush=True)

    # B: forward only (carry params so nothing is constant-folded)
    def fwd_loss(p, feat):
        gr = with_feat(feat)
        pred = model.apply(cast_p(p), gr, training=True)
        logits = pred.nf[b.seed_local_idx]
        onehot = jax.nn.one_hot(b.labels, N_CLASSES)
        return masked_logit_crossentropy(logits, onehot, b.label_mask)

    def step_fwd(carry):
        p, feat = carry
        loss = fwd_loss(p, feat)
        return (jax.tree_util.tree_map(
            lambda x: x + loss.astype(x.dtype) * 0, p), feat)

    t_b = bench.time_iterated(step_fwd, (params, feat_dev))
    print(f"B forward:         {t_b*1e3:6.2f} ms", file=sys.stderr,
          flush=True)

    # C: fwd + bwd
    def step_grad(carry):
        p, feat = carry
        _, grads = jax.value_and_grad(fwd_loss)(p, feat)
        return (jax.tree_util.tree_map(lambda x, g_: x - 0.0 * g_, p,
                                       grads), feat)

    t_c = bench.time_iterated(step_grad, (params, feat_dev))
    print(f"C fwd+bwd:         {t_c*1e3:6.2f} ms", file=sys.stderr,
          flush=True)

    # D: full step
    def step_full(carry):
        p, s, feat = carry
        loss, grads = jax.value_and_grad(fwd_loss)(p, feat)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, feat)

    t_d = bench.time_iterated(step_full, (params, opt_state, feat_dev))
    flops = model_step_flops(NP, EP)
    mfu = flops / t_d / 197e12
    print(f"D full step:       {t_d*1e3:6.2f} ms   "
          f"({flops/1e9:.0f} GFLOP -> {mfu:.1%} MFU @197TF/s)",
          file=sys.stderr, flush=True)

    import json
    print(json.dumps({
        "gather_ms": t_a * 1e3, "fwd_ms": t_b * 1e3,
        "fwd_bwd_ms": t_c * 1e3, "full_step_ms": t_d * 1e3,
        "step_gflop": flops / 1e9, "mfu_at_197tf": mfu,
    }))


if __name__ == "__main__":
    main()
