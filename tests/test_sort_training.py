"""End-to-end training slice: the sort task learns (loss drops, accuracy
rises) with a small model on CPU — the minimum proof the framework works
(SURVEY.md §7 P3; recipe from ``/root/reference/examples/sort/sort.jl``)."""

import numpy as np

from graphnets_tpu.data.sort_task import (SortTaskConfig, gen_sample,
                                          get_batch, sort_pad_spec)
from graphnets_tpu.training.train import train_sort


def test_edge_targets_semantics():
    rng = np.random.default_rng(0)
    cfg = SortTaskConfig(vocab_size=20, min_nodes=4, max_nodes=4)
    adj, x_nf, y_nf, y_ef, values = gen_sample(rng, cfg)
    n = len(values)
    assert adj.shape == (n, n) and (adj == 1).all()
    # exactly one minimum-class node per distinct minimum
    assert y_nf[:, 1].sum() == (values == values.min()).sum()
    # n-1 enabled consecutive edges
    assert y_ef[:, 1].sum() == n - 1
    # the enabled edges chain the sorted order
    order = np.argsort(values, kind="stable")
    mat = y_ef[:, 1].reshape(n, n, order="F" if False else "C")
    # y_ef rows are column-major flattened; rebuild matrix accordingly
    mat = y_ef[:, 1].reshape((n, n), order="F")
    for a, b in zip(order[:-1], order[1:]):
        assert mat[a, b] == 1


def test_batch_shapes_static():
    cfg = SortTaskConfig(vocab_size=10, batch_size=3)
    pad = sort_pad_spec(cfg)
    rng = np.random.default_rng(1)
    shapes = set()
    for _ in range(3):
        x, y = get_batch(rng, cfg, pad)
        shapes.add((x.nf.shape, x.senders.shape, y.ef.shape, y.nf.shape))
    assert len(shapes) == 1  # jit-stable across random batches


def test_sort_learns():
    cfg = SortTaskConfig(vocab_size=12, min_nodes=2, max_nodes=5,
                         batch_size=8)
    res = train_sort(steps=150, cfg=cfg, core_dims=(32, 32, 32), n_cores=1,
                     learning_rate=3e-3, seed=0)
    assert res.metrics["loss"] < 1.0, res.metrics
    assert res.metrics["node_acc"] > 0.75, res.metrics
    assert res.metrics["edge_acc"] > 0.75, res.metrics


def test_sort_evaluate():
    from graphnets_tpu.training.evaluate import sort_accuracy
    cfg = SortTaskConfig(vocab_size=12, min_nodes=2, max_nodes=4,
                         batch_size=4)
    res = train_sort(steps=120, cfg=cfg, core_dims=(32, 32, 32), n_cores=1,
                     learning_rate=3e-3, seed=1)
    acc = sort_accuracy(res.model, res.state.params, cfg, num_batches=5)
    assert 0.0 <= acc["graph_acc"] <= 1.0
    assert acc["node_acc"] > 0.6


def test_sort_graph_acc_floor_device_loop():
    """CI-budget regression gate for the flagship recipe: 1500 device-side
    steps at reduced dims must clear a graph-accuracy floor on fresh eval
    data (the 20k-step full recipe reaches graph_acc 0.78 / node_acc 1.00 /
    edge_acc 0.99 — benchmarks/flagship_f32.json)."""
    from graphnets_tpu.training.train import evaluate_sort, train_sort_device
    cfg = SortTaskConfig(vocab_size=16, min_nodes=2, max_nodes=5,
                         batch_size=8)
    res = train_sort_device(steps=1500, cfg=cfg, core_dims=(48, 48, 48),
                            n_cores=1, learning_rate=3e-3, seed=0, chunk=250)
    ev = evaluate_sort(res.model, res.state.params, cfg, n_batches=16)
    assert ev["node_acc"] > 0.9, ev
    assert ev["edge_acc"] > 0.85, ev
    assert ev["graph_acc"] > 0.3, ev


def test_sort_learns_bf16_end_to_end():
    """bf16-compute training (f32 params) learns the task end to end —
    accuracy floor on fresh eval data, not just finite loss."""
    import jax.numpy as jnp

    from graphnets_tpu.training.train import evaluate_sort, train_sort_device
    cfg = SortTaskConfig(vocab_size=12, min_nodes=2, max_nodes=5,
                         batch_size=8)
    res = train_sort_device(steps=600, cfg=cfg, core_dims=(32, 32, 32),
                            n_cores=1, learning_rate=3e-3, seed=0, chunk=200,
                            dtype=jnp.bfloat16)
    ev = evaluate_sort(res.model, res.state.params, cfg, n_batches=16,
                       dtype=jnp.bfloat16)
    assert ev["node_acc"] > 0.85, ev
    assert ev["edge_acc"] > 0.8, ev
