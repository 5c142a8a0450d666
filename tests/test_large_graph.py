"""Neighbor sampling + large-graph node classification (BASELINE configs
4-5's single-host slice): static shapes, receptive-field correctness, and a
small end-to-end training run."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphnets_tpu.data.large_graph import LargeGraph, NeighborSampler
from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.models.gn_block import GNBlock
from graphnets_tpu.training.losses import masked_logit_crossentropy


def random_graph(n=200, avg_deg=6, d=16, n_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    e = n * avg_deg
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    labels = rng.integers(0, n_classes, n)
    # features weakly correlated with labels so learning is possible
    feat = rng.normal(size=(n, d)).astype(np.float32)
    feat[:, :n_classes] += 3.0 * np.eye(n_classes)[labels]
    return LargeGraph.from_coo(senders, receivers, feat, labels), n_classes


def test_csc_construction():
    g, _ = random_graph()
    # every edge (indptr range of node v) has receiver v in the original COO
    deg = g.indptr[1:] - g.indptr[:-1]
    assert deg.sum() == g.num_edges
    assert (deg >= 0).all()


def test_sampler_static_shapes():
    g, _ = random_graph()
    s = NeighborSampler(g, fanouts=(5, 3), batch_size=8, seed=1)
    shapes = set()
    for seeds in (np.arange(8), np.arange(50, 58), np.arange(3)):  # short too
        b = s.sample(seeds)
        shapes.add((b.graph.nf.shape, b.graph.senders.shape,
                    b.labels.shape))
    assert len(shapes) == 1


def test_sampler_edges_point_to_requesting_node():
    g, _ = random_graph()
    s = NeighborSampler(g, fanouts=(4,), batch_size=4, seed=2)
    seeds = np.array([0, 1, 2, 3])
    b = s.sample(seeds)
    E = int(b.graph.n_edge[0])
    recv = np.asarray(b.graph.receivers)[:E]
    assert (recv < 4).all()  # one layer: all edges target seed positions


def test_node_classification_learns():
    g, n_classes = random_graph(n=300, d=16, seed=3)
    sampler = NeighborSampler(g, fanouts=(8,), batch_size=32, seed=4)
    model = EncodeProcessDecode((0, 16, 0), (32, 32, 32),
                                (1, n_classes, 0), n_cores=1)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, graph, labels, label_mask, seed_idx):
        def loss_fn(p):
            pred = model.apply(p, graph)
            logits = pred.nf[seed_idx]
            onehot = jax.nn.one_hot(labels, n_classes)
            return masked_logit_crossentropy(logits, onehot, label_mask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    train_nodes = np.arange(g.num_nodes)
    for epoch in range(4):
        for b in sampler.epoch(train_nodes):
            params, opt_state, loss = step(
                params, opt_state, b.graph, b.labels, b.label_mask,
                b.seed_local_idx)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_sampler_node_ids_mode_matches_feature_mode():
    """emit_node_ids batches + a device feature-table gather reproduce the
    host-gathered nf exactly (the round-4 device-resident-features path:
    batches ship indices, the step gathers on device)."""
    from graphnets_tpu.data.large_graph import device_feature_table
    g, _ = random_graph(seed=3)
    s_feat = NeighborSampler(g, fanouts=(5, 3), batch_size=8, seed=7)
    s_idx = NeighborSampler(g, fanouts=(5, 3), batch_size=8, seed=7,
                            emit_node_ids=True)
    feat = device_feature_table(g)
    seeds = np.arange(16, 24)
    b_feat = s_feat.sample(seeds)
    b_idx = s_idx.sample(seeds)
    assert b_idx.graph.nf is None and b_idx.node_ids is not None
    # identical subgraph structure (same rng stream per sampler instance)
    np.testing.assert_array_equal(np.asarray(b_feat.graph.senders),
                                  np.asarray(b_idx.graph.senders))
    np.testing.assert_array_equal(np.asarray(b_feat.graph.receivers),
                                  np.asarray(b_idx.graph.receivers))
    nf_dev = jnp.take(feat, b_idx.node_ids, axis=0)
    np.testing.assert_array_equal(np.asarray(nf_dev),
                                  np.asarray(b_feat.graph.nf))


def test_sample_layer_thread_count_invariant():
    """The threaded native sampler draws per-node streams: results are
    identical for threads=1 and threads=2."""
    from graphnets_tpu.runtime import native
    if not native.available():
        import pytest
        pytest.skip("native runtime unavailable")
    g, _ = random_graph(n=3000, avg_deg=8, seed=5)
    frontier = np.arange(2048, dtype=np.int64)
    pos = np.arange(2048, dtype=np.int64)
    s1, p1 = native.sample_layer(g.indptr, g.src, frontier, pos, 4, 123,
                                 threads=1)
    s2, p2 = native.sample_layer(g.indptr, g.src, frontier, pos, 4, 123,
                                 threads=2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(p1, p2)
    # contract: <= fanout per frontier node, sources are real in-neighbors
    counts = np.bincount(p1, minlength=2048)
    assert counts.max() <= 4


def test_prefetch_pool_multi_worker():
    """PrefetchPool drains every worker's iterator exactly once."""
    from graphnets_tpu.data.prefetch import PrefetchPool

    def factory(wid):
        return iter([(wid, i) for i in range(5)])

    got = sorted(PrefetchPool(factory, num_workers=3, device_put=False))
    assert got == sorted((w, i) for w in range(3) for i in range(5))


def test_sampler_kernel_contracts():
    """Round 5: the fused G=1 / sorted kernel paths now engage on sampled
    subgraphs (node capacity rounded to a multiple of 128), which makes
    these layout invariants GRADIENT-critical (the agg-fused backward's
    sorted_gather silently corrupts on unsorted receivers):

      * receivers globally ascending, pads included;
      * pad edges target a padded node slot (>= all real receivers);
      * node/edge capacities multiples of 128.
    """
    g, _ = random_graph(n=500, avg_deg=5, seed=3)
    s = NeighborSampler(g, fanouts=(6, 4), batch_size=16, seed=2,
                        emit_node_ids=True)
    assert s.max_nodes % 128 == 0 and s.max_edges % 128 == 0
    for seeds in (np.arange(16), np.arange(100, 109)):  # full + short batch
        b = s.sample(seeds)
        rcv = np.asarray(b.graph.receivers)
        snd = np.asarray(b.graph.senders)
        n_real_e = int(np.asarray(b.graph.n_edge)[0])
        n_real_n = int(np.asarray(b.graph.n_node)[0])
        assert (np.diff(rcv) >= 0).all(), "receivers must be ascending"
        assert rcv.shape[0] == s.max_edges
        # pads target the pad node (the first slot past the real nodes)
        assert (rcv[n_real_e:] == n_real_n).all()
        assert (snd[n_real_e:] == n_real_n).all()
        assert n_real_n < s.max_nodes
        # real receivers stay below the pad node
        assert (rcv[:n_real_e] < n_real_n).all()


def test_sampled_subgraph_kernel_path_matches_pure():
    """The kernels that now engage on sampled subgraphs (fused G=1 edge
    update with in-kernel agg + sorted gathers) produce the same losses
    and gradients as the pure-XLA oracle path — run in Pallas interpret
    mode on a real sampled batch (pads target the pad node, short batch
    included)."""
    from graphnets_tpu.training.losses import masked_logit_crossentropy
    from graphnets_tpu.utils.config import enable_pallas

    g, n_classes = random_graph(n=300, avg_deg=6, d=16, seed=5)
    s = NeighborSampler(g, fanouts=(4, 4), batch_size=8, seed=3,
                        emit_node_ids=True)
    b = s.sample(np.arange(8))
    from graphnets_tpu.data.large_graph import device_feature_table
    feat = device_feature_table(g, jnp.float32)
    graph = b.graph.with_features(nf=jnp.take(feat, b.node_ids, axis=0))

    model = EncodeProcessDecode((0, 16, 0), (128, 128, 128),
                                (1, n_classes, 0), n_cores=1)
    params = model.init(jax.random.PRNGKey(0))

    def loss_of(p):
        pred = model.apply(p, graph, training=True)
        logits = pred.nf[b.seed_local_idx]
        onehot = jax.nn.one_hot(b.labels, n_classes)
        return masked_logit_crossentropy(logits, onehot, b.label_mask)

    # sanity: this shape engages the fused G=1 kernel in the cores
    from graphnets_tpu.ops.pallas.edge_update_g1 import \
        supports_g1_edge_update
    assert supports_g1_edge_update(graph.num_edge_slots,
                                   graph.num_node_slots, 128, 128, 4,
                                   with_agg=True)

    l_pure, g_pure = jax.value_and_grad(loss_of)(params)
    enable_pallas(True, interpret=True)
    try:
        l_k, g_k = jax.value_and_grad(loss_of)(params)
    finally:
        enable_pallas(False, interpret=False)
    np.testing.assert_allclose(float(l_k), float(l_pure),
                               rtol=1e-5, atol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_pure)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-5)


def test_node_classification_example_runs():
    """The user-facing large-graph example (examples/node_classification.py)
    trains and clears its own accuracy bar end to end."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "examples/node_classification.py",
         "--steps", "300"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r.returncode == 0, r.stderr[-2000:] + r.stdout[-500:]
    assert "node_classification ok" in r.stdout
