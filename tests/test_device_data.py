"""Device-side sort-task batch generation must match the host generator's
semantics exactly: same structure invariants, same targets given the same
values (``/root/reference/examples/sort/sort.jl:12-24`` + ``helper.jl``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnets_tpu.data.sort_task import (SortTaskConfig, device_batch,
                                          sort_pad_spec, _edge_targets)
from graphnets_tpu.utils.debug import validate_graph


CFG = SortTaskConfig(vocab_size=100, min_nodes=2, max_nodes=10, batch_size=4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_batch_matches_host_semantics(seed):
    pad = sort_pad_spec(CFG)
    x, y = jax.jit(lambda k: device_batch(k, CFG, pad))(
        jax.random.PRNGKey(seed))
    validate_graph(x)
    validate_graph(y)

    n_node = np.asarray(x.n_node)
    n_edge = np.asarray(x.n_edge)
    B = CFG.batch_size
    assert (n_node[:B] >= CFG.min_nodes).all()
    assert (n_node[:B] <= CFG.max_nodes).all()
    assert (n_edge[:B] == n_node[:B] ** 2).all()

    nf = np.asarray(x.nf)
    ynf = np.asarray(y.nf)
    yef = np.asarray(y.ef)
    s, r = np.asarray(x.senders), np.asarray(x.receivers)
    noff = np.concatenate([[0], np.cumsum(n_node[:B])])
    eoff = np.concatenate([[0], np.cumsum(n_edge[:B])])
    for b in range(B):
        n = int(n_node[b])
        vals = nf[noff[b]:noff[b + 1]].argmax(-1) + 1
        # one-hot inputs
        assert (nf[noff[b]:noff[b + 1]].sum(-1) == 1).all()
        # node target: is-minimum (ties included)
        want_min = (vals == vals.min()).astype(int)
        got_min = ynf[noff[b]:noff[b + 1]].argmax(-1)
        np.testing.assert_array_equal(got_min, want_min)
        # edge structure: full graph, canonical column-major order
        se = s[eoff[b]:eoff[b + 1]] - noff[b]
        re = r[eoff[b]:eoff[b + 1]] - noff[b]
        k = np.arange(n * n)
        np.testing.assert_array_equal(re, k // n)
        np.testing.assert_array_equal(se, k % n)
        # edge target: consecutive-in-stable-sorted-order, exactly the host
        # generator's definition
        want_e = _edge_targets(vals)
        got_e = yef[eoff[b]:eoff[b + 1]].argmax(-1)
        np.testing.assert_array_equal(got_e, want_e)


def test_device_batch_padding_is_clean():
    pad = sort_pad_spec(CFG)
    x, y = device_batch(jax.random.PRNGKey(7), CFG, pad)
    em = np.asarray(x.edge_mask)
    nm = np.asarray(x.node_mask)
    N = int(nm.sum())
    # padded edges target the first padding node; padded features are zero
    assert (np.asarray(x.senders)[~em] == N).all()
    assert (np.asarray(x.receivers)[~em] == N).all()
    assert (np.asarray(x.nf)[~nm] == 0).all()
    # receivers globally sorted (Pallas sorted-segment-sum precondition)
    assert (np.diff(np.asarray(x.receivers)) >= 0).all()


def test_device_batch_distribution_of_sizes():
    """n is uniform over [min, max] like the reference's rand(2:10)."""
    pad = sort_pad_spec(CFG)
    sizes = []
    for seed in range(64):
        x, _ = device_batch(jax.random.PRNGKey(seed), CFG, pad)
        sizes.extend(np.asarray(x.n_node)[:CFG.batch_size].tolist())
    sizes = np.array(sizes)
    assert sizes.min() == CFG.min_nodes and sizes.max() == CFG.max_nodes
